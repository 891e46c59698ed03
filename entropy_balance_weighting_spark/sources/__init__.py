"""Sources & sinks: problem-bundle serialization (SURVEY §2.1 S2/S3)."""
