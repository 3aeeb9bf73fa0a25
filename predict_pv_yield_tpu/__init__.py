"""predict_pv_yield_tpu — a TPU-native solar PV / GSP nowcasting framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
``openclimatefix/predict_pv_yield`` (reference mounted read-only at
``/root/reference``): forecasting solar electricity yield 0.5–2 h ahead from
satellite imagery, NWP grids, historical yield series, system-ID embeddings
and datetime features.

Layer map (mirrors SURVEY.md §1, redesigned TPU-first):

* ``config``   — hydra-compatible YAML composition + dataset Configuration
* ``data``     — Batch pytree, fake backend, shard readers, device prefetch
* ``models``   — flax model zoo (baseline / conv3d×3 / perceiver×3 + experiments)
* ``training`` — generic jitted train/eval engine, callbacks, loggers
* ``parallel`` — device-mesh construction and sharding policy
* ``ops``      — Pallas/XLA kernels (optical flow, warping, SSIM)
"""

__version__ = "0.1.0"
