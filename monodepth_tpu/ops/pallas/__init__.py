"""Pallas TPU kernels. The one that ships is the warp sampler
(`warp_sample.py`) — the step's hot op. A fused SSIM+L1 kernel was
built, measured a wash against XLA's own fusion (0.72 vs 0.76 ms at
640x192 b4 on v5e-1 — the loss class is VPU-compute-bound elementwise
math XLA already fuses optimally), and deleted in round 3; the
measurement and the Mosaic lessons live in docs/PERF.md and CLAUDE.md.
"""
