"""sparklink — a PySpark-native entity-resolution / record-linkage engine.

Re-creates the query and data-processing capabilities of
dedupeio/dedupe-examples (reference at /root/reference, read-only) as an
idiomatic Spark DataFrame pipeline over tables of multi-turn transcripts:

    canonicalize -> preprocess -> block -> candidate pairs -> score -> cluster

See SURVEY.md for the operator-by-operator mapping (reference file:line
citations live in each module's docstrings).
"""

__version__ = "0.1.0"

from sparklink.session import get_spark  # noqa: F401
