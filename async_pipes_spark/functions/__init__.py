from async_pipes_spark.functions.dedup import (  # noqa: F401
    decontaminate_corpus,
    exact_dup_groups,
    fingerprint_dup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from async_pipes_spark.functions.json import json_get_int  # noqa: F401
from async_pipes_spark.functions.money import cents, dec2, money_sum, revenue_cents  # noqa: F401
from async_pipes_spark.functions.sampling import (  # noqa: F401
    group_sample,
    hash_sample,
    stratified_sample,
    weighted_mixture_sample,
)
from async_pipes_spark.functions.similarity import (  # noqa: F401
    cosine_topk,
    embedding_near_dups,
    ivf_assign,
    exact_rerank,
    exact_rerank_distributed,
    ivf_knn_join,
    ivf_pq_encode,
    ivf_pq_knn_join,
    ivf_pq_topk,
    ivf_probe_assign,
    ivf_topk,
    kmeans_centroids,
    pq_codebooks,
    pq_encode,
    pq_topk,
)
from async_pipes_spark.functions.sketches import kmv_distinct  # noqa: F401
from async_pipes_spark.functions.text import (  # noqa: F401
    fingerprint,
    langid_scores,
    quality_metrics,
    token_count_bpe_ish,
    token_count_ws,
    winnow_fingerprint,
    winnow_fingerprints,
)
from async_pipes_spark.functions.vectors import (  # noqa: F401
    cosine_sim_f32,
    dot_f32,
    micro_units,
    norm_f32,
)
