"""Pure-NumPy geometry kernels (no Spark imports here).

Modules:
  s2coords  — coordinate transforms (lat/lng ↔ xyz ↔ face/u,v ↔ s,t ↔ i,j)
  cellid_v1 — classic Hilbert-position S2 cell id (levels 0..30)
  cellid_v2 — the fork's face‖path‖level encoding (levels 0..28)
  metrics   — level ↔ size calculus (quadratic projection constants)
  h3        — H3-style aperture-7 hex indexing (public-spec structure)
"""

from . import cellid_v1, cellid_v2, metrics, s2coords  # noqa: F401
