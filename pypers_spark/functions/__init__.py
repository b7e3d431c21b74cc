from pypers_spark.functions.hashing import md5_int64, md5_int64_seeded, md5_hex  # noqa: F401
from pypers_spark.functions.text import (  # noqa: F401
    char_ngrams,
    normalize_text,
    punct_ratio,
    stopword_ratio,
    tokenize_bpeish,
    tokenize_ws,
    upper_ratio,
)
from pypers_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
