"""Re-export: the JSTS-style corpus moved into the package so the
driver-facing conformance queries can import it without tests/ on the
path. See jschon_spark/conformance_corpus.py."""

from jschon_spark.conformance_corpus import (  # noqa: F401
    CASES,
    DYNAMIC_2019_CASES,
    FORMAT_CASES,
    LEGACY_2019_CASES,
)
