from iceberg_metadata_pipeline_spark.quality.checks import (  # noqa: F401
    Check,
    ConstraintResult,
    VerificationSuite,
)
