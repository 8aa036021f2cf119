"""Ray-Data-native crawl + data-processing engine with the query/data
capabilities of nicholaides/Methanol-Web-Crawler (libmetha), re-expressed
as ray.data.Dataset pipelines over Arrow batches.

Layout:
  functions/  pure-Python per-row kernels (canonicalizer, UMEX, parsers,
              robots, filetype matching, text stats) — zero Ray imports
  sources/    fixture synthesis + parquet readers/sinks
  stages/     vectorized map_batches stage wrappers
  state/      stateful actor pools (URL-seen shards, politeness)
  pipelines/  the crawl round-driver, dedup/ANN/text pipelines, simulator
"""
__version__ = "0.1.0"
