"""ai00_server_tpu — TPU-native OpenAI-compatible inference server for RWKV.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Ai00-X/ai00_server (an OpenAI-compatible HTTP server for RWKV v4..v7 RNN
language models).  The compute path is pure JAX + Pallas TPU kernels; the
serving tiers (HTTP frontend -> middleware dispatcher -> batched runtime)
are asyncio services around fixed-shape compiled step functions.

Reference capability map: see /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
