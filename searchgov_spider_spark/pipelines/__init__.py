"""Large-scale training-data pipeline operators.

Beyond the reference crawler's own operators (SURVEY.md §2), a 100 TB
crawl corpus needs corpus-preparation operators: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine), approximate
similarity search, text analysis (language-ID, quality scoring, token
counting, fingerprinting), interleaved text+media span manipulation
(the BASELINE input_hint table shape), and multimodal column plumbing.

Every operator here is expressed with native ``pyspark.sql.functions``
(JVM-side, whole-stage-codegen) wherever possible; Python appears only in
Arrow-batched pandas UDFs. Operators whose outputs are deterministic ship
a DuckDB oracle-SQL generator next to the Spark implementation (the
portable md5-based hash family in ``functions.hashing`` makes MinHash /
SimHash / fingerprints bit-identical across engines).
"""

from . import (  # noqa: F401
    cleaning,
    dedup,
    events,
    multimodal,
    packing,
    prep,
    profiling,
    sampling,
    search,
    similarity,
    spans,
    temporal,
    textstats,
    warehouse,
)
