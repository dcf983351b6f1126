"""Column-level function library (JVM-side, whole-stage-codegen friendly).

Everything here returns pyspark Columns built from built-in functions —
no Python UDFs — so expressions stay inside Tungsten codegen and scale
to 100 TB without serialization overhead.
"""

from .text import (  # noqa: F401
    char_shingles,
    digit_ratio,
    punct_ratio,
    token_count_bpeish,
    token_count_ws,
    tokens_ws,
    upper_ratio,
    whitespace_ratio,
)
from .vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    lit_vector,
)
