"""datamart_ray — a Ray-Data-native full-text index + BM25 search engine.

A from-scratch re-implementation of the search/data-processing core of
DataMart/Auctus (reference: Kamesh-Mishra/datamart), built on
``ray.data.Dataset`` pipelines over zero-copy Arrow batches:

- ``datamart_ray.analyzer``   — the analyzer chain (lowercase → tokenize),
  the analog of the reference ES analyzer (coordinator/elasticsearch.yml:2-20).
- ``datamart_ray.index``      — segmented inverted-index build: tokenize →
  (term, doc_id, tf) triples → sort-partitioned posting chunks with
  delta+varbyte compression and per-chunk max-score metadata; manifests for
  checkpoint/resume (the analog of the ES index writer,
  lib_core/datamart_core/common.py:158-236).
- ``datamart_ray.search``     — BM25 (k1=1.2, b=0.75) top-k query engine
  (the analog of apiserver/apiserver/search/__init__.py:553-563, TOP_K=50).
- ``datamart_ray.stages``     — training-data-scale operators: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard), text stats (lang-id,
  quality, token counts, fingerprints), embedding similarity search,
  multimodal stubs.
- ``datamart_ray.pipelines``  — relational operator pipelines (joins,
  aggregations, top-k, unions) mirroring the reference's augmentation
  engine (lib_augmentation/datamart_augmentation/augmentation.py).
"""

from datamart_ray.analyzer import Analyzer
from datamart_ray.search.bm25 import BM25Params

__all__ = ["Analyzer", "BM25Params"]
__version__ = "0.1.0"
