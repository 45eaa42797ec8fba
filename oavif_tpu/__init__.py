"""oavif-tpu: a TPU-native target-quality AVIF still-image encoder.

A from-scratch JAX/XLA re-design of the capability surface of
Enter-tainer/oavif (reference: /root/reference): given an input image and a
target SSIMULACRA2 score, search the quantizer that meets the target within a
tolerance and pass budget, and emit a standard .avif file.

Layering (TPU-first, not a port):
  - ``oavif_tpu.options``  — encoder options + CLI arg parsing (parity with
    reference src/parse_args.zig:48-122).
  - ``oavif_tpu.tq``       — the target-quality search engine (parity with
    reference src/tq.zig:124-210) plus batched speculative probing.
  - ``oavif_tpu.io``       — host-side image ingestion (PNG/PAM/JPEG/WebP/AVIF),
    AV1 OBU writer and ISOBMFF/AVIF muxer (reference src/io.zig).
  - ``oavif_tpu.metric``   — SSIMULACRA2 on TPU in pure JAX (reference
    delegates to fssimu2, src/tq.zig:37).
  - ``oavif_tpu.av1``      — the AV1 intra encoder core: RGB→YUV, integer
    transforms, quantization, intra prediction, RD search, reconstruction,
    tokenization — dense, batched, MXU/VPU-friendly JAX/XLA.
  - ``oavif_tpu.backend``  — encoder backends: ``tpu`` (ours) and ``oracle``
    (libavif/libaom via Pillow/ctypes — conformance oracle + baseline only).
  - ``oavif_tpu.parallel`` — device mesh setup, tile sharding via shard_map.
"""

__version__ = "0.2.0"
