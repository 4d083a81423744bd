"""Domain query modules; importing this package registers every query."""

from hebrew_ner_spark.querydefs import (  # noqa: F401
    bloom_q,
    crawl_q,
    curation_q,
    dedup_q,
    extract_q,
    graph_q,
    graphstats_q,
    hybrid_q,
    kg_chain,
    labels_q,
    lattice_q,
    mentions_q,
    multimodal_q,
    relational_q,
    segment_q,
    simsearch_q,
    sketches_q,
    textstats_q,
    training_q,
    weblinks_q,
)
