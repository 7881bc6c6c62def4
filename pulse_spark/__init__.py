"""pulse_spark — PySpark-native inverted-index build + BM25/TFIDF top-k
search engine with the query semantics of just-hms/pulse, plus
large-scale training-data pipeline operators (dedup, ANN, text stats).
"""

__version__ = "0.1.0"
