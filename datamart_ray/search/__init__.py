from datamart_ray.search.bm25 import BM25Params, bm25_idf, bm25_tf_norm

__all__ = ["BM25Params", "bm25_idf", "bm25_tf_norm"]
