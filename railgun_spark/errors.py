"""Shared error classification for Spark AnalysisExceptions.

Used wherever 'the path does not exist yet' is an expected first-run
state (fingerprint/band index reads, streaming flag sinks) but every
OTHER read failure must stay loud: swallowing a permissions blip or a
corrupt footer as 'empty' silently disables dedup/decontamination.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException


def analysis_error_class(e: AnalysisException) -> str | None:
    """The structured error class, robust across PySpark versions:
    getCondition is the Spark 4 name, getErrorClass its predecessor."""
    for attr in ("getCondition", "getErrorClass"):
        get = getattr(e, attr, None)
        if get is not None:
            cls = get()
            if cls is not None:
                return cls
    return None


def is_path_not_found(e: AnalysisException) -> bool:
    """True iff the exception is the 'path does not exist' class. The
    string check only applies when NO structured class is available
    (builds predating error classes) — message wording changes across
    Spark versions must not reclassify a real failure."""
    cls = analysis_error_class(e)
    return cls == "PATH_NOT_FOUND" or (cls is None and "PATH_NOT_FOUND" in str(e))
