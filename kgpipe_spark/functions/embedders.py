"""Pluggable text-embedding providers (SURVEY.md §2.4).

Mirrors the reference's ``Embedder`` seam
(`/root/reference/src/kgpipe/util/embeddings/emb.py`, `st_emb.py:17-24`:
sentence-transformers lazily loaded behind the ``[ml]`` extra,
`pyproject.toml:23-25`): a provider maps a text batch to an (n, dim)
float32 matrix with L2-normalized rows, so cosine is a plain dot product.

The default is the deterministic hashed char-3-gram embedder — no ML
dependencies, bit-reproducible across engines (its sparse integer twin is
what the DuckDB oracles replay). A real model plugs in either per call
(``embedder=`` on the linking operators) or process-wide
(``set_default_embedder``) without touching operator code.

Providers are shipped inside Arrow-batched pandas UDFs, so they must be
picklable; heavyweight models should lazy-load on first ``encode`` call in
the worker (the reference's ``get_model()`` global does exactly this).
"""

from __future__ import annotations

import hashlib
from typing import Protocol, runtime_checkable

import numpy as np
import pandas as pd

EMBED_DIM = 64


@runtime_checkable
class Embedder(Protocol):
    """encode(batch) → (len(batch), dim) float32, rows L2-normalized."""

    dim: int

    def encode(self, texts: pd.Series) -> np.ndarray: ...


class HashedGramEmbedder:
    """Char-3-gram signed hashed embedding (md5 first-4-bytes little-endian,
    sign bit 31, modulus ``dim``), L2-normalized. Deterministic, no deps."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim

    def encode(self, texts: pd.Series) -> np.ndarray:
        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts):
            s = " " + (t or "").lower() + " "
            for j in range(len(s) - 2):
                g = s[j : j + 3]
                h = int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:4], "little")
                out[i, h % self.dim] += 1.0 if (h >> 31) & 1 == 0 else -1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms


class SentenceTransformerEmbedder:
    """Real-model provider (reference ``st_emb.py``): lazy-loads
    sentence-transformers per process on first encode. Requires the
    optional dependency — absent in this container, so constructing it is
    fine but encoding raises ImportError with install guidance."""

    def __init__(self, model_name: str = "all-MiniLM-L6-v2", dim: int = 384):
        self.model_name = model_name
        self.dim = dim
        self._model = None  # lazy; never pickled with a loaded model

    def __getstate__(self):
        return {"model_name": self.model_name, "dim": self.dim, "_model": None}

    def encode(self, texts: pd.Series) -> np.ndarray:
        if self._model is None:
            try:
                from sentence_transformers import SentenceTransformer  # type: ignore
            except ImportError as e:  # pragma: no cover - dep not in container
                raise ImportError(
                    "SentenceTransformerEmbedder needs the optional "
                    "'sentence-transformers' package (the reference's [ml] "
                    "extra); install it or use HashedGramEmbedder"
                ) from e
            self._model = SentenceTransformer(self.model_name)
        mat = np.asarray(
            self._model.encode(list(texts), normalize_embeddings=True),
            dtype=np.float32,
        )
        return mat


_default_embedder: Embedder = HashedGramEmbedder()


def get_default_embedder() -> Embedder:
    return _default_embedder


def set_default_embedder(embedder: Embedder) -> None:
    """Process-wide swap (e.g. once at job start). Operators capture the
    provider at call time, so swap before building the plan."""
    global _default_embedder
    _default_embedder = embedder
