"""gos2_spark — a from-scratch PySpark-native spherical-geometry / spatial-join engine.

Re-expresses the computational capabilities of the gos2 S2-geometry library
(reference: /root/reference, davidreynolds/gos2) as:

- ``kernels/``  — pure-numpy vectorized kernels (Hilbert CellID codec,
  face/uv/st projection, robust predicates). Zero Spark deps; unit-tested
  bit-for-bit against the reference's golden vectors.
- ``geometry/`` — driver-side region objects (Cap, Rect, Loop, Polygon, Cell)
  implementing the Region contract used by the coverer.
- ``cover/``    — CellUnion normalization + RegionCoverer (algorithm-identical
  best-first covering) + FloodFill/SimpleCovering.
- ``spark/``    — the engine proper: pandas-UDF function surface, spatial
  joins (point-in-polygon, cap/rect range, kNN), skew handling, per-partition
  checkpointing, synthetic pages source.
- ``pipeline/`` — large-scale training-data ops (dedup, similarity search,
  text analysis, multimodal plumbing) over the documents/embeddings tables.
"""

__version__ = "0.1.0"
