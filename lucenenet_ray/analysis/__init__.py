from lucenenet_ray.analysis.standard import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    StandardAnalyzer,
    analyze,
    analyze_batch,
    tokenize,
)
