"""Large-scale training-data pipeline operators (north-star extensions —
no reference counterpart; designed for 100 TB from the start):

- :mod:`data_cube_spark.operators.dedup`      exact / fingerprint / MinHash-LSH / SimHash / n-gram Jaccard
- :mod:`data_cube_spark.operators.similarity` brute-force + LSH-bucketed ANN over embeddings
- :mod:`data_cube_spark.operators.text`       language-ID, quality scoring, token stats
- :mod:`data_cube_spark.operators.multimodal` binary media columns + pure-python PNG/BMP/PNM/WAV codecs
- :mod:`data_cube_spark.operators.decontam`   benchmark n-gram-overlap decontamination
- :mod:`data_cube_spark.operators.joins`      as-of / range / salted-skew joins
- :mod:`data_cube_spark.operators.sampling`   deterministic fraction/stratified/mixture sampling
- :mod:`data_cube_spark.operators.packing`    sequence packing (concat-chunk + greedy) for the training loader
"""
