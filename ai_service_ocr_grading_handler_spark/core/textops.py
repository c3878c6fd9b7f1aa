"""Pure-Python ports of the reference's string/scoring semantics (the ⚙ core).

Each function reproduces the cited reference behavior EXACTLY — including
known quirks that affect output bytes (see the per-function notes). These are
the oracle for the pytest byte-identity suite; the Spark pipeline applies the
same logic either as native Column expressions (scoring/flags) or via
Arrow-batched pandas UDFs (the regex extractors), and tests assert equality
against this module.

Reference citations use /root/reference paths.
"""

from __future__ import annotations

import json
import re

__all__ = [
    "find_data_in_string",
    "convert_feedback_format",
    "convert_rubric_to_string",
    "assign_rubric_id_to_response",
    "correctness_flag",
    "blankness_flag",
    "route_model",
    "mapping_model_with_name",
    "LLM_NAME_MAPPING",
    "LEVEL_SCORES",
]

# Model-routing dimension table — gen_ai_calling.py:13-31 (16 rows).
LLM_NAME_MAPPING: dict[str, dict[str, str]] = {
    "gpt-4-latest": {"modelName": "gpt-4o", "modelClass": "gptText"},
    "gpt-3.5-latest": {"modelName": "gpt-3.5-turbo", "modelClass": "gptText"},
    "claude-latest": {"modelName": "claude-3-5-sonnet-20241022", "modelClass": "claudeText"},
    "claude-small": {"modelName": "claude-3-haiku-20240229", "modelClass": "claudeText"},
    "claude-medium": {"modelName": "claude-3-opus-20240229", "modelClass": "claudeText"},
    "gemini-latest": {"modelName": "gemini-1.5-pro", "modelClass": "geminiText"},
    "gemini-small": {"modelName": "gemini-1.5-flash", "modelClass": "geminiText"},
    "gpt-vision": {"modelName": "gpt-4o", "modelClass": "gptOCR"},
    "gpt-ocr-vision": {"modelName": "gpt-4o", "modelClass": "gptVisionOCR"},
    "gpt-vision-mcq": {"modelName": "gpt-4o", "modelClass": "gptVisionMCQ"},
    "llamma-latest": {"modelName": "meta-llama-3.1-405b-instruct", "modelClass": "llamaText"},
    "shozemi-gpt-latest": {"modelName": "gpt-4o", "modelClass": "argumentativeEssayOcr"},
    "claude-vision-ocr": {"modelName": "claude-3-5-sonnet-20240620", "modelClass": "claudeVisionOCR"},
    "ensamble-vision": {"modelName": "llama-13B-vision", "modelClass": "visionEnsamble"},
    "gemini-vision-number": {"modelName": "gemini-1.5-pro", "modelClass": "geminiVisionNumber"},
    "whole-page-ocr": {"modelName": "gpt-4o", "modelClass": "wholePageOcr"},
}

# Level -> score increments — utils.py:146-162.
LEVEL_SCORES: dict[str, float] = {
    "Effective": 1.0,
    "Good": 1.0,
    "Satisfactory": 1.0,
    "Normal": 0.5,
    "Fair": 0.5,
}

_OCR_STRIP_QUOTES_RE = re.compile(r'^"+|"+$')
_OCR_PATTERN = r"(?i)ocr:\s*['\"](.*?)['\"]"  # utils.py:171
_OCR_JSON_PATTERN = r"(?i)\{\s*['\"]ocr['\"]\s*:\s*['\"](.*?)['\"]\s*\}"  # utils.py:174
_JSON_BLOCK_RE = re.compile(r"\{.*?\}", re.DOTALL)  # utils.py:184,191


def find_data_in_string(data_string: str, type: str = "ocr"):
    """Span extraction from raw model text — utils.py:167-203, byte-exact.

    - ``ocr``: strip wrapping double quotes, return the first
      ``ocr:"..."`` or ``{"ocr": "..."}`` match, else the cleaned string.
    - ``claude-json``: first minimal ``{...}`` block (DOTALL) else input.
    - ``argumentative-essay-ocr``: all ``{...}`` blocks json-parsed,
      re-dumped with indent=4, then fed through convert_feedback_format;
      returns (formatted_feedback, level_score) like the reference.
    """
    # TOTALITY (deliberate divergence from the reference, which crashes on
    # both): a NULL/None input yields the empty result, and `{...}` blocks
    # that are not valid JSON are skipped rather than raising — in the
    # reference a bad row errors one Lambda request; in Spark an exception
    # here kills the task and its retries for one poisoned row.
    if data_string is None:
        return ("", 0.0) if type == "argumentative-essay-ocr" else ""
    if type == "ocr":
        data_string_clean = _OCR_STRIP_QUOTES_RE.sub("", data_string)
        matches = re.findall(_OCR_PATTERN, data_string_clean) + re.findall(
            _OCR_JSON_PATTERN, data_string_clean
        )
        return matches[0] if len(matches) > 0 else data_string_clean
    elif type == "claude-json":
        m = _JSON_BLOCK_RE.search(data_string)
        if m is not None:
            # reference returns group(0) when non-empty else the input —
            # utils.py:187 (the len check can never be 0 for this pattern,
            # preserved for parity)
            return m.group(0) if len(m.group()) > 0 else data_string
        return data_string
    elif type == "argumentative-essay-ocr":
        json_objects = []
        for match in _JSON_BLOCK_RE.findall(data_string):
            try:
                json_objects.append(json.loads(match))
            except ValueError:
                continue  # prose braces like 'the set {a, b}' are not JSON
        final_json_string = json.dumps(json_objects, indent=4)
        return convert_feedback_format(final_json_string)
    return None


def convert_feedback_format(feedback_json: str) -> tuple[str, float]:
    """Level-based feedback formatting + score aggregation — utils.py:146-162.

    Effective/Good/Satisfactory -> +1; Normal/Fair -> +0.5; else +0.
    Returns (formatted_feedback.strip(), score_level_based).
    """
    feedback_list = json.loads(feedback_json)
    formatted_feedback = ""
    score_level_based: float = 0
    for feedback in feedback_list:
        if not isinstance(feedback, dict):
            continue  # totality: a parsed block like "[1]" is not feedback
        formatted_feedback += f"{ feedback.get('FeedbackPointName')} - {feedback.get('improvement')}\n\n"
        level_name = feedback.get("levelName")
        if level_name is not None:
            score_level_based += LEVEL_SCORES.get(level_name, 0)
    return formatted_feedback.strip(), score_level_based


def convert_rubric_to_string(rubric_json) -> str:
    """Rubric stringification — utils.py:132-140 (trailing ", " preserved)."""
    if isinstance(rubric_json, list):
        rubric_string = "Rubrics: "
        for r in rubric_json:
            rubric_string += (str(r["score"]) + " Points: ") + (r["criteria"] + ", ")
        return rubric_string
    return rubric_json


def assign_rubric_id_to_response(rubric_json, response_json):
    """Positional (index-based, NOT keyed) rubric↔response zip + sums —
    utils.py:205-221. Returns (response_json, score, max_score)."""
    max_score: float = 0
    score: float = 0
    if isinstance(rubric_json, list):
        for i in range(0, len(rubric_json)):
            response_json[i]["rubricId"] = rubric_json[i]["rubricId"]
            response_json[i]["rubricWiseMaxScore"] = rubric_json[i]["score"]
            response_json[i]["criteria"] = rubric_json[i]["criteria"]
            response_json[i].pop("rubricIndex", None)
            response_json[i].pop("rubricText", None)
            score += response_json[i]["rubricWiseScore"]
            max_score += rubric_json[i]["score"]
        return response_json, score, max_score
    return response_json, score, max_score


def correctness_flag(score, max_score) -> bool:
    """isCorrect — utils.py:95-100: True only on full marks; partial -> False."""
    if score == max_score:
        return True
    return False


def blankness_flag(ocr) -> bool:
    """isBlank — utils.py:102-111, including the dead branch: the reference
    compares ``ocr.lower()=='Empty Response'`` which is never true (lowercased
    lhs vs mixed-case literal), so ONLY the empty string is blank for str
    inputs. Preserved exactly for byte-parity."""
    if isinstance(ocr, int):
        return ocr == ""  # reference's int branch compares int to '' -> False
    return ocr == "" or ocr.lower() == "Empty Response"


def route_model(grading_prompt: str | None, model_name: str | None) -> str:
    """gradingPrompt -> model alias, the 7-way if/elif chain at
    gen_ai_calling.py:140-159 plus the fallback at :159."""
    gp = grading_prompt if grading_prompt is not None else "default"
    if gp == "expository-essay-ocr":
        return "claude-vision-ocr"
    elif gp in ("ocr", "OCR", "gpt-ocr"):
        return "gpt-ocr-vision"
    elif gp == "gpt-grading-only":
        return "gpt-4-latest"
    elif gp == "claude-ocr":
        return "claude-vision-ocr"
    elif gp == "argumentative-essay-ocr":
        return "shozemi-gpt-latest"
    elif gp == "gemini-number":
        return "gemini-vision-number"
    elif gp == "whole-page-ocr":
        return "whole-page-ocr"
    # reference falls back ONLY on the empty string (gen_ai_calling.py:159:
    # `reqobj['modelName'] if reqobj['modelName']!='' else "gpt-4-latest"`);
    # a JSON-null modelName is None != '' -> returned as-is, and the alias
    # mapping then yields the 'model does not found' sentinel
    return model_name if model_name != "" else "gpt-4-latest"


def mapping_model_with_name(model_name: str, llm_name_mapping=None):
    """Alias -> {modelName, modelClass} with the reference's sentinel string
    on miss — utils.py:141-145."""
    mapping = llm_name_mapping if llm_name_mapping is not None else LLM_NAME_MAPPING
    for key, value in mapping.items():
        if key == model_name:
            return value
    return "model does not found"


# --- provider message-dialect conversions -------------------------------------
# Byte-exact ports of /root/reference/engine/core/llm_format_convertion.py.
# NOTE: convert_gpt_to_gemini is defined TWICE in the reference (:35 and
# :88); Python keeps the second, so only the :88 semantics (claude-style
# system fold + single parts message) are live — ported accordingly.


def convert_normal_to_gpt(message: dict) -> list[dict]:
    """llm_format_convertion.py:5-33: ordered system/system/system/user
    messages; empty answer -> "No Answer" (quirk: the 'studentAnswer: '
    prefix is dropped in that case)."""
    out: list[dict] = []
    if "systemPrompt" in message:
        out.append({"role": "system", "content": message["systemPrompt"]})
    if "rubric" in message:
        out.append({"role": "system", "content": message["rubric"]})
    if "question" in message:
        out.append({"role": "system", "content": "question: " + message["question"]})
    if "studentAnswer" in message or "answer" in message:
        ans = str(message["answer"])
        out.append(
            {"role": "user", "content": ("studentAnswer: " + ans) if ans != "" else "No Answer"}
        )
    return out


def _fold_system_and_user(gpt_data: list[dict]) -> tuple[str, str]:
    system = ""
    combined = ""
    for m in gpt_data:
        if m["role"] == "system":
            system += m["content"].strip() + "\n\n"
        elif m["role"] == "user":
            combined += m["content"] + ","  # trailing comma quirk preserved
    return system.strip(), combined


def convert_gpt_to_claude(gpt_data: list[dict]) -> dict:
    """llm_format_convertion.py:52-70."""
    system, combined = _fold_system_and_user(gpt_data)
    return {
        "system": system,
        "messages": [
            {"role": "user", "content": [{"text": combined, "type": "text"}]}
        ],
    }


def convert_gpt_to_gemini(gpt_data: list[dict]) -> dict:
    """llm_format_convertion.py:88-106 (the LIVE second definition)."""
    system, combined = _fold_system_and_user(gpt_data)
    return {"system": system, "messages": [{"role": "user", "parts": [combined]}]}


def convert_gpt_to_llamma(gpt_data: list[dict]) -> dict:
    """llm_format_convertion.py:72-86 (reference spelling kept)."""
    system, combined = _fold_system_and_user(gpt_data)
    return {"system": system, "prompt": combined}
