"""Embedding interface — the engine's version of the reference's
SentenceTransformer wrappers (`embed_documents`/`embed_query`,
/root/reference/build_vectorstore.py:38-44, main.py:40-46).

Two implementations behind one shape (DataFrame in, DataFrame out with
an `array<float>` column):

  * HashingEmbedder — deterministic feature-hashing embedder (Arrow-
    batched pandas UDF, numpy-vectorized): the oracle-safe test path.
  * SentenceTransformerEmbedder — the model-backed drop-in, gated
    behind an import-try (the model libs aren't in this image).

At scale the UDF path is the right shape regardless of model: Arrow
batches flow per-partition, model weights load once per executor
(lazily, in the UDF), and no shuffle is introduced.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_DIM = 64


@lru_cache(maxsize=65536)
def _token_slot_sign(token: str, dim: int) -> tuple[int, float]:
    h = int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16)
    return h % dim, 1.0 if (h >> 8) & 1 else -1.0


def embed_texts_numpy(texts: pd.Series, dim: int = DEFAULT_DIM) -> list[list[float]]:
    """Feature-hashing embedding: tokens hash to (slot, sign); vector
    is the L2-normalized slot histogram. Pure, deterministic."""
    out = []
    for t in texts:
        vec = np.zeros(dim, dtype=np.float64)
        for tok in (t or "").split():
            slot, sign = _token_slot_sign(tok, dim)
            vec[slot] += sign
        n = np.linalg.norm(vec)
        if n > 0:
            vec = vec / n
        out.append([float(x) for x in vec.astype(np.float32)])
    return out


class HashingEmbedder:
    # one UDF object per dim, shared across instances: repeated query
    # invocations then build canonically-EQUAL plans, so Spark's cache
    # manager dedupes persisted relations derived from the embedder
    # instead of accumulating a new cache entry per invocation
    _udf_cache: dict[int, object] = {}

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim

    def udf(self):
        cached = HashingEmbedder._udf_cache.get(self.dim)
        if cached is not None:
            return cached
        dim = self.dim

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def embed(texts: pd.Series) -> pd.Series:
            return pd.Series(embed_texts_numpy(texts, dim))

        HashingEmbedder._udf_cache[self.dim] = embed
        return embed

    def embed_col(self, text: Column) -> Column:
        return self.udf()(text)


class SentenceTransformerEmbedder:
    """Model-backed embedder (reference used all-MiniLM-L6-v2 / KURE-v1,
    build_vectorstore.py:31-47). Optional drop-in; requires
    sentence-transformers at runtime."""

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2"):
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:  # pragma: no cover - lib not in image
            raise NotImplementedError(
                "sentence-transformers is not installed in this environment; "
                "use HashingEmbedder for deterministic runs"
            ) from e
        self.model_name = model_name

    def udf(self):  # pragma: no cover - lib not in image
        model_name = self.model_name

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def embed(texts: pd.Series) -> pd.Series:
            from sentence_transformers import SentenceTransformer

            model = SentenceTransformer(model_name)  # loads once per executor
            vecs = model.encode(texts.fillna("").tolist())
            return pd.Series([[float(x) for x in v] for v in vecs])

        return embed
