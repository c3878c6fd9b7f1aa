"""ai-service-ocr-grading-handler-spark: PySpark-native extraction engine."""
