"""Ray-Data-native spatial-join + tiling engine.

A from-scratch rebuild of the data-processing capabilities of
``simone-f/wikipedia-tags-in-osm`` (see SURVEY.md §0 — the reference
checkout was empty; BASELINE.json is the authoritative spec), expressed
as idiomatic Ray Data pipelines:

- ``engine.geo``      pure-numpy geospatial kernels (H3-like hex index,
                      S2-like quadtree index, STR-tree + point-in-polygon,
                      cell-ring-expansion kNN)
- ``engine.codec``    from-scratch image codecs (raw16 lossless, qdct
                      lossy with PSNR>=40dB), perceptual hash
- ``engine.ops``      generic relational / text / dedup / similarity
                      operator pack over Ray Datasets
- ``engine.pipeline`` ingest -> spatial join -> kNN -> tiling pipelines
                      with lineage manifest + resume
- ``engine.io``       source/sink seam (parquet today, Lance-shaped
                      logical schema)

No module in this package calls ``ray.init`` — sessions are owned by the
driver, ``bench.py``, or the test fixture.
"""

__version__ = "0.1.0"
