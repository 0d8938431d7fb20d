"""Codec kernels: pure numpy, no Spark dependency.

- primitives: zbra-parity kernels (FOR / zig-zag / BP64 / full pipeline)
- intcodecs: the segment container + int codec family (const/raw/zbra/
  forbp/delta/dict/rle/zstd-wrap)
- bytescodecs: binary-column codecs (raw/zstd/dict/fsst/const)
- fsst: FSST string compression (VLDB'20), vectorized
"""
