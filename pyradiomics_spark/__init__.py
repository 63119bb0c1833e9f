"""pyradiomics_spark — a from-scratch PySpark-native feature-engineering engine.

Re-expresses the extraction semantics of AIM-Harvard/pyradiomics (reference at
/root/reference, studied for behavior only) as idiomatic Spark: DataFrame/SQL
plans optimized by Catalyst, Arrow-vectorized pandas-UDF kernels for the numpy
feature math, a sort-merge point-in-time as-of join, and windowed temporal
operators (lag/lead, ffill/bfill, gap sessionize) with zero-temporal-leakage
discipline.

Layout
------
- ``config``     : validated settings (binWidth/binCount/distances/... defaults
                   mirroring /root/reference/radiomics/featureextractor.py:147-163)
- ``kernels``    : pure-numpy feature kernels (firstorder, glcm, glrlm, glszm,
                   ngtdm, gldm) + exact binning semantics
- ``functions``  : columnar helpers — html→text extraction, tokenization,
                   intensity transforms, text quality/lang-id/fingerprints
- ``operators``  : Spark operators — feature extraction drivers, as-of join,
                   window ops, sessionize, dedup, similarity search, resegment
- ``sources``    : deterministic synthetic pages table, testdata readers, sinks
                   + checkpoint/resume ledger
- ``plans``      : config-driven extraction pipeline (the analog of
                   RadiomicsFeatureExtractor.execute)
- ``streaming``  : Structured Streaming sessionize/watermark wrappers
- ``multimodal`` : binary-column (image/audio) plumbing with stubbed decoders
"""

__version__ = "0.1.0"

from pyradiomics_spark.config import ExtractionSettings  # noqa: F401
