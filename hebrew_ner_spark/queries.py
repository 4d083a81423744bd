"""Aggregated query registry (driver contract surface).

All queries live in ``hebrew_ner_spark/querydefs/*``; importing them
populates the registry. This module re-exports QUERIES/ORACLES for
``__spark_entry__.py``.
"""

from hebrew_ner_spark.registry import ORACLES, QUERIES, query  # noqa: F401

import hebrew_ner_spark.querydefs  # noqa: F401,E402  (registration side-effect)
