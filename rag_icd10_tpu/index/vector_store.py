"""HBM-resident vector store — the Milvus-Lite replacement.

API parity with the reference MilvusService (services/milvus_service.py):
``insert_records`` (:208), ``search`` (:271, level-weighted + re-sorted),
``load_collection``/``release_collection`` (:343,:411), ``clear_collection``,
``get_collection_stats``, ``get_memory_usage`` (:497, bytes = n*dim*4),
``health_check`` (:524), ``test_connection`` (:373).

TPU-first differences:
- The collection is a padded (N, D) matrix resident in HBM plus host-side
  metadata columns; persistence is an .npz + JSON sidecar instead of a
  SQLite-backed Milvus Lite file (reference db file: ./db/milvus_icd10.db,
  milvus_service.py:31).
- ``search`` takes a BATCH of query vectors and issues ONE fused device
  program (Pallas scoring + top-k); the level weights ×{1.2,1.0,0.8}
  (milvus_service.py:550-558) are fused into the kernel epilogue, not a
  Python post-pass.
- load/release_collection move the matrix on/off device — the same warm-
  state lifecycle the reference exposes via /resource endpoints.
- Search-time shapes are bucketed (batch rows -> power of two, k -> small
  grid) so the jit cache stays bounded.
"""

from __future__ import annotations

import json
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from ..config import StoreConfig
from ..data.corpus import ICDCorpus, ICDRecord
from ..ops.flat_topk import flat_search_jax, pad_corpus
from ..ops.pallas_score import fused_search


def _use_pallas() -> bool:
    """The fused Pallas kernel targets the TPU Mosaic compiler; on CPU
    (tests / virtual meshes) the pure-XLA path is used instead."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False

_K_BUCKETS = (8, 16, 32, 64, 128)


def _bucket_k(k: int) -> int:
    for b in _K_BUCKETS:
        if k <= b:
            return b
    return _K_BUCKETS[-1]


def _next_pow2(n: int, lo: int = 8) -> int:
    p = lo
    while p < n:
        p *= 2
    return p


@dataclass
class SearchHit:
    """One search result row (fields per reference schema,
    milvus_service.py:174-186 + weighted score semantics :292-316)."""

    id: int
    code: str
    preferred_zh: str
    score: float  # level-weighted score (may exceed raw cosine)
    original_score: float  # raw IP/cosine before level weighting
    level: int
    parent_code: str
    category_path: str
    semantic_text: str
    main_code: str = ""
    secondary_code: str = ""
    has_complication: bool = False

    def to_dict(self) -> Dict:
        return {
            "id": self.id,
            "code": self.code,
            "preferred_zh": self.preferred_zh,
            "score": self.score,
            "original_score": self.original_score,
            "level": self.level,
            "parent_code": self.parent_code,
            "category_path": self.category_path,
            "semantic_text": self.semantic_text,
            "main_code": self.main_code,
            "secondary_code": self.secondary_code,
            "has_complication": self.has_complication,
        }


class PendingSearch:
    """A dispatched-but-unmaterialized search.

    ``search_dispatch`` returns one of these after issuing the device
    work WITHOUT blocking on any result; ``finalize()`` blocks (fetches
    the arrays through the tunnel, applies the certificate-redo policy,
    builds SearchHit rows). Splitting the two lets the serving layer
    dispatch batch n+1's encode+search while batch n's results are
    still downloading — on-device overlap without a second chip
    (api/batching.py has the pipeline story)."""

    __slots__ = ("_finalize", "_hits")

    def __init__(self, finalize=None, hits=None):
        self._finalize = finalize
        self._hits = hits

    def finalize(self) -> List[List["SearchHit"]]:
        if self._hits is None:
            self._hits = self._finalize()
            self._finalize = None  # free captured device arrays
        return self._hits


class VectorStore:
    """Batched TPU flat-scan vector store over an ICD corpus."""

    #: search() accepts device (jax) query arrays on the flat paths
    accepts_device_queries = True

    def __init__(
        self,
        dim: int,
        config: Optional[StoreConfig] = None,
        hnsw_config=None,
    ):
        from ..config import HNSWConfig

        self.config = config or StoreConfig()
        self.hnsw_config = hnsw_config or HNSWConfig()
        self.dim = dim
        self.corpus: Optional[ICDCorpus] = None
        self._vectors: Optional[np.ndarray] = None  # host (N, D) fp32
        self._title_rows: Optional[Dict[str, List[int]]] = None
        # device-resident state (set by load_collection)
        self._dev = None  # dict(corpus, weights, mask) of jax arrays
        self._sharded = None  # ShardedFlatSearcher (multi-device corpus)
        self._semantic_vectors: Optional[np.ndarray] = None
        self._hnsw = None  # native graph index (index_type == "HNSW")
        self._bound_scale = None  # w_max * max row norm (method="fast")
        self._max_row_norm = None  # unweighted max row norm (bf16 bound)
        self._chunkstore = None  # ops/chunk_stream state (method="chunkstream")
        self._sketch = None  # ops/sketch screen (method="sketch" / host tier)
        self._loaded = False
        self._searches = 0
        # finalize() runs on the serving host pool, so with depth-2
        # pipelining two batches can bump the stats counter
        # concurrently; += is a read-modify-write and would drop counts
        self._searches_lock = threading.Lock()
        self._created_at = time.time()

    # ------------------------------------------------------------ insert

    def insert_records(
        self,
        records: Sequence[ICDRecord],
        vectors: np.ndarray,
        semantic_vectors: Optional[np.ndarray] = None,
    ) -> int:
        """Append records + their embeddings. Returns inserted count.

        ``semantic_vectors`` optionally carries embeddings of each record's
        ``semantic_text`` — kept resident so the rescoring stack never
        re-embeds candidates (the reference re-embeds 2x per candidate,
        hierarchical_similarity_service.py:387-409).
        """
        vectors = np.asarray(vectors, dtype=np.float32)
        assert vectors.shape == (len(records), self.dim), vectors.shape
        new = ICDCorpus(list(records))
        if self.corpus is None:
            self.corpus = new
            self._vectors = vectors.copy()
            if semantic_vectors is not None:
                self._semantic_vectors = np.asarray(
                    semantic_vectors, dtype=np.float32
                ).copy()
        else:
            old, self.corpus = self.corpus, ICDCorpus([])
            self.corpus.codes = old.codes + new.codes
            self.corpus.titles = old.titles + new.titles
            self.corpus.main_codes = old.main_codes + new.main_codes
            self.corpus.secondary_codes = old.secondary_codes + new.secondary_codes
            self.corpus.has_complication = np.concatenate(
                [old.has_complication, new.has_complication]
            )
            self.corpus.levels = np.concatenate([old.levels, new.levels])
            self.corpus.parent_codes = old.parent_codes + new.parent_codes
            self.corpus.category_paths = old.category_paths + new.category_paths
            self.corpus.semantic_texts = old.semantic_texts + new.semantic_texts
            self.corpus._code_to_idx = None
            n_old = self._vectors.shape[0]
            self._vectors = np.concatenate([self._vectors, vectors], axis=0)
            if semantic_vectors is not None:
                add = np.asarray(semantic_vectors, np.float32)
                if self._semantic_vectors is None:
                    # semantic vectors arriving only now: backfill earlier
                    # rows with their record embeddings so the matrix stays
                    # row-parallel (previously this batch was silently
                    # dropped)
                    self._semantic_vectors = np.concatenate(
                        [self._vectors[:n_old], add]
                    )
                else:
                    self._semantic_vectors = np.concatenate(
                        [self._semantic_vectors, add]
                    )
            elif self._semantic_vectors is not None:
                # keep row-parallel; fall back to the record embeddings
                # when no semantic_text embeddings were given
                self._semantic_vectors = np.concatenate(
                    [self._semantic_vectors, vectors]
                )
        self._loaded = False  # device state is stale
        self._dev = None
        self._sharded = None
        # the graph index and the certificate scale cover only the old
        # rows; drop them so save() cannot persist a stale graph and the
        # fast-path bound is recomputed over the appended rows
        self._hnsw = None
        self._bound_scale = None
        self._max_row_norm = None
        self._chunkstore = None
        self._sketch = None  # screen covers only the old rows
        self._title_rows = None  # exact-title map misses the new rows
        return len(records)

    # ------------------------------------------------- exact-title lookup

    def exact_title_hits(
        self, title: str, query_vec: np.ndarray, max_rows: int = 3
    ) -> List[SearchHit]:
        """Rows whose title is verbatim ``title``, scored against
        ``query_vec`` with the standard weighted-score convention.

        The rescoring stack's exact-match floor (hierarchy.py, 1.5) can
        only fire on a FETCHED candidate; short generic titles at level 3
        (weight 0.8) can be buried below the over-fetch horizon by x1.2
        level-weighted near-duplicates (the reference has the same blind
        spot — its extractor and Milvus scan never see the title list).
        The orchestrator injects these rows into the candidate set so a
        verbatim-title query always reaches its own row."""
        if self.corpus is None or self._vectors is None:
            return []
        if getattr(self, "_title_rows", None) is None:
            rows: Dict[str, List[int]] = {}
            for j, t in enumerate(self.corpus.titles):
                rows.setdefault(t.strip(), []).append(j)
            self._title_rows = rows
        idxs = self._title_rows.get(title.strip(), ())
        weights = self.corpus.level_weights(self.config.level_weights)
        q = np.asarray(query_vec, dtype=np.float32).reshape(-1)
        hits = []
        for j in idxs[:max_rows]:
            raw = float(self._vectors[j] @ q)
            w = float(weights[j]) or 1.0
            hits.append(
                SearchHit(
                    id=j,
                    code=self.corpus.codes[j],
                    preferred_zh=self.corpus.titles[j],
                    score=raw * w,
                    original_score=raw,
                    level=int(self.corpus.levels[j]),
                    parent_code=self.corpus.parent_codes[j],
                    category_path=self.corpus.category_paths[j],
                    semantic_text=self.corpus.semantic_texts[j],
                    main_code=self.corpus.main_codes[j],
                    secondary_code=self.corpus.secondary_codes[j],
                    has_complication=bool(self.corpus.has_complication[j]),
                )
            )
        return hits

    # ----------------------------------------------------------- lifecycle

    @property
    def num_entities(self) -> int:
        return 0 if self.corpus is None else len(self.corpus)

    def _use_sharded(self) -> bool:
        """Corpus-dimension sharding policy: "on" forces it, "auto" shards
        when more than one accelerator is attached (the 40k corpus is
        single-chip-tiny, but the same store code must serve a sharded
        100M-row corpus on a pod slice — SURVEY.md §5 distributed row)."""
        mode = (self.config.sharded or "auto").lower()
        if mode == "off":
            return False
        try:
            n = len(jax.devices())
        except Exception:
            return False
        if mode == "on":
            return n > 1
        return n > 1 and jax.default_backend() == "tpu"

    def load_collection(self) -> bool:
        """Pad + transfer the corpus matrix, level weights and padding mask
        to device HBM (reference analog: milvus_service.py:343).

        Multi-device: the corpus rows shard across all devices instead
        (one ShardedFlatSearcher; per-shard fused scan + all_gather(k)
        merge, parallel/search.py)."""
        if self._vectors is None or self.corpus is None:
            return False
        weights = self.corpus.level_weights(self.config.level_weights)
        if self.config.device_dtype == "host":
            # capacity tier (ops/sketch.py): the only device residency is
            # the d_sketch-dim int8 screen (~d_sketch+12 bytes/row); the
            # full-width matrix stays host-resident and serves candidate
            # rows to the exact re-rank. Overrides sharding — the host
            # tier is the single-chip beyond-HBM answer; beyond one HOST,
            # row-shard the sketch the same way the corpus shards.
            self._ensure_sketch()
            self._dev = None
            self._loaded = True
            return True
        if self._use_sharded():
            from jax.sharding import Mesh

            from ..parallel.search import ShardedFlatSearcher

            mesh = Mesh(np.array(jax.devices()), ("shard",))
            # the capacity tier composes with sharding: int8 residency
            # shards 4x the rows per HBM byte (bfloat16 config falls
            # back to fp32 shards — the searcher quantizes int8 only)
            self._sharded = ShardedFlatSearcher(
                self._vectors, weights, mesh, axis="shard",
                store_dtype=(
                    "int8" if self.config.device_dtype == "int8" else "fp32"
                ),
            )
            self._dev = None  # single-device residency replaced by shards
            self._loaded = True
            return True
        cp, wp, m = pad_corpus(
            self._vectors, weights, multiple=self.config.pad_multiple
        )
        # certificate scale for the "fast" (chunk-select) method:
        # w_max * max row norm bounds any row's scan-error contribution
        norms_sq = np.einsum("nd,nd->n", self._vectors, self._vectors)
        self._max_row_norm = (
            float(np.sqrt(float(np.max(norms_sq)))) if norms_sq.size else 1.0
        )
        self._bound_scale = float(
            (np.max(weights) if weights.size else 1.0) * self._max_row_norm
        )
        if self.config.device_dtype == "int8":
            # symmetric per-row quantization: 4x less HBM than fp32
            # (ops/quantized.py; FAISS-SQ8 analog, int8 MXU contraction)
            from ..ops.quantized import quantize_rows

            q, scale = quantize_rows(cp)
            self._dev = {
                "corpus_q": jax.device_put(q),
                "scale": jax.device_put(scale),
                "weights": jax.device_put(wp),
                "mask": jax.device_put(m),
            }
            self._loaded = True
            return True
        if self.config.device_dtype == "bfloat16":
            import jax.numpy as jnp

            cp = cp.astype(jnp.bfloat16)
        self._dev = {
            "corpus": jax.device_put(cp),
            "weights": jax.device_put(wp),
            "mask": jax.device_put(m),
        }
        self._loaded = True
        return True

    def release_collection(self) -> bool:
        """Drop device arrays (reference analog: milvus_service.py:411)."""
        self._dev = None
        self._sharded = None
        self._chunkstore = None
        self._sketch = None
        self._loaded = False
        return True

    def _ensure_chunkstore(self):
        """Lazily build the streaming chunk-select state (transposed
        weight-folded corpus + raw fp32 rows, ops/chunk_stream.py) the
        first time method="chunkstream" is requested. Residency cost: one
        extra (D, N_pad) array in the configured scan dtype (fp32 = the
        corpus again; bf16/int8 = half/quarter of it)."""
        if self._chunkstore is None:
            from ..ops.chunk_stream import ChunkStore

            scan = self.config.chunkstream_scan
            weights = self.corpus.level_weights(self.config.level_weights)
            self._chunkstore = ChunkStore.build(
                self._vectors, weights,
                scan_dtype={
                    "bf16": "bf16", "pallas_bf16": "bf16",
                    "int8": "int8", "pallas_int8": "int8",
                }.get(scan, "fp32"),
            )
        return self._chunkstore

    def _ensure_sketch(self):
        """Lazily build the device sketch screen (ops/sketch.py) — the
        residency of STORE_DEVICE_DTYPE=host, or an on-demand A/B path
        when method="sketch" is requested on a resident store."""
        if self._sketch is None:
            from ..ops.sketch import build_sketch

            weights = self.corpus.level_weights(self.config.level_weights)
            self._sketch = build_sketch(
                self._vectors, weights,
                d_sketch=self.config.sketch_dim,
                kind=self.config.sketch_proj,
                pad_multiple=self.config.pad_multiple,
            )
        return self._sketch

    def clear_collection(self) -> bool:
        self.release_collection()
        self.corpus = None
        self._vectors = None
        self._semantic_vectors = None
        return True

    @property
    def is_loaded(self) -> bool:
        return self._loaded

    def get_collection_load_state(self) -> Dict:
        """Reference analog: milvus_service.py get_collection_load_state."""
        return {
            "loaded": self._loaded,
            "num_entities": self.num_entities,
            "collection_name": self.config.collection_name,
        }

    # ------------------------------------------------------------- search

    def search(
        self,
        query_vectors: np.ndarray,
        top_k: int = 5,
        method: Optional[str] = None,
        ef_search: Optional[int] = None,
    ) -> List[List[SearchHit]]:
        """Batched blocking search — dispatch + finalize in one call."""
        return self.search_dispatch(
            query_vectors, top_k, method=method, ef_search=ef_search
        ).finalize()

    def search_dispatch(
        self,
        query_vectors: np.ndarray,
        top_k: int = 5,
        method: Optional[str] = None,
        ef_search: Optional[int] = None,
    ) -> PendingSearch:
        """Batched search: (B, D) query vectors -> per-query top_k hits,
        level-weighted and sorted desc (reference: milvus_service.py:271-316,
        which handles one query; here B queries cost one device call).

        Returns a PendingSearch: the device paths dispatch their programs
        and defer every blocking fetch (result download, certificate
        check + exact redo, hit construction) to ``finalize()``; the
        host-side paths (HNSW, sketch re-rank, int8 host re-rank, empty
        store) compute eagerly and finalize() just hands the rows back.

        ``method`` ("exact"/"approx"/"fast"/"streaming"/"chunkstream"/
        "sketch"/"hnsw") and ``ef_search`` (HNSW beam
        width) are per-request overrides of the config defaults — the
        reference exposes the same knobs through its Milvus index params
        (README_MILVUS_CONFIG.md). "chunkstream" is the huge-corpus
        streaming path (ops/chunk_stream.py): certified chunk-select
        with a CHUNKSTREAM_SCAN-dtype pass 1 and exact fp32 pass 2.
        "sketch" is the beyond-HBM capacity tier (ops/sketch.py): device
        int8 sketch screen + host-row exact re-rank — the resident path
        when STORE_DEVICE_DTYPE=host."""
        requested = method  # per-request override, pre-default (host tier
        # rejects explicit exactness-promising methods but serves its own
        # default through the sketch screen)
        method = method or self.config.search_method
        # device (jax) query arrays are accepted and stay on device for
        # the flat scan paths — the serving hot path feeds the encoder
        # output straight in, saving a host round trip per batch
        # (~30 ms through the axon tunnel). Host-side paths (HNSW, int8
        # re-rank, empty store) transparently pull the array down.
        on_device = isinstance(query_vectors, jax.Array) and not isinstance(
            query_vectors, np.ndarray
        )
        if on_device:
            q = (
                query_vectors
                if query_vectors.ndim == 2
                else query_vectors[None, :]
            )
        else:
            q = np.atleast_2d(np.asarray(query_vectors, dtype=np.float32))
        if self.num_entities == 0:
            return PendingSearch(hits=[[] for _ in range(q.shape[0])])
        k_eff = min(max(top_k, 1), self.num_entities)
        if self.config.index_type.upper() == "HNSW" or method == "hnsw":
            # graph path runs host-side; no device residency required
            q = np.asarray(q, dtype=np.float32)
            return PendingSearch(
                hits=self._search_hnsw(q, k_eff, ef_search=ef_search)
            )
        if not self._loaded:
            if not self.load_collection():
                return PendingSearch(hits=[[] for _ in range(q.shape[0])])
        b = q.shape[0]
        k_pad = _bucket_k(k_eff)
        b_pad = _next_pow2(b)
        if on_device and self._dev is not None and "corpus" in self._dev:
            import jax.numpy as jnp

            q_pad = jnp.pad(
                q.astype(jnp.float32), ((0, b_pad - b), (0, 0))
            )
        else:
            q = np.asarray(q, dtype=np.float32)
            q_pad = np.zeros((b_pad, self.dim), dtype=np.float32)
            q_pad[:b] = q
        cert = None  # set by the certified paths; checked in finalize()
        if self._sharded is not None:
            # per-request method knob is honored per shard (hnsw was
            # dispatched to the host graph path above; an unsupported
            # method raises so the API can 400 instead of silently
            # falling back)
            smethod = "auto" if method == "exact" else method
            if getattr(self._sharded, "store_dtype", "fp32") == "int8":
                # int8 SELECTS (approximate w.r.t. fp32 rows); the host
                # re-ranks the merged over-fetch against fp32 rows so
                # served scores stay exact — the same contract as the
                # single-device int8 store path below
                if smethod not in ("auto", "exact", "chunkstream"):
                    if requested is None:
                        # a configured fp32-kernel default (fast/
                        # streaming) has no int8 spelling: serve the
                        # materialized int8 scan instead of failing
                        # every request; explicit overrides still 400
                        smethod = "exact"
                shard_rows = (
                    self._sharded.n_padded
                    // self._sharded.mesh.shape[self._sharded.axis]
                )
                m = min(_bucket_k(4 * k_eff), shard_rows, self.num_entities)
                m = max(m, k_eff)
                svals, sidx = self._sharded.search(q_pad, k=m, method=smethod)
                q_h = np.asarray(q_pad[:b], np.float32)
                sidx = np.asarray(sidx[:b])
                valid = (sidx >= 0) & (sidx < self.num_entities)
                safe = np.clip(sidx, 0, self.num_entities - 1)
                weights_h = self.corpus.level_weights(
                    self.config.level_weights
                )
                exact = (
                    np.einsum("bd,bkd->bk", q_h, self._vectors[safe])
                    * weights_h[safe]
                )
                exact = np.where(valid, exact, -np.inf)
                order = np.argsort(-exact, axis=1)[:, :k_eff]
                vals = np.take_along_axis(exact, order, axis=1)
                idx = np.take_along_axis(safe, order, axis=1)
                with self._searches_lock:
                    self._searches += b
                return PendingSearch(hits=self.build_hits(vals, idx))
            vals, idx = self._sharded.search(q_pad, k=k_pad, method=smethod)
        elif method == "sketch" or self.config.device_dtype == "host":
            # capacity tier (ops/sketch.py): device int8 sketch screen +
            # host-row exact fp32 re-rank. Selection is approximate
            # (screen recall measured by bench config 9); returned scores
            # are exact — the HNSW contract, at beyond-HBM corpus sizes.
            if self.config.device_dtype == "host" and requested not in (
                None, "sketch", "hnsw",
            ):
                raise ValueError(
                    f"method={requested!r} promises full-precision "
                    "residency the host tier does not keep; host-resident "
                    "stores serve method='sketch' (or 'hnsw')"
                )
            sk = self._ensure_sketch()
            weights_h = self.corpus.level_weights(self.config.level_weights)
            from ..ops.sketch import sketch_search_host_rerank

            m = self.config.sketch_fetch or 0
            vals, idx = sketch_search_host_rerank(
                sk, self._vectors, weights_h, np.asarray(q_pad), k=k_eff,
                m=m,
            )
            with self._searches_lock:
                self._searches += b
            return PendingSearch(hits=self.build_hits(vals[:b], idx[:b]))
        elif self._dev is not None and "corpus_q" in self._dev:
            if method == "chunkstream":
                raise ValueError(
                    "chunkstream requires fp32 device residency "
                    "(STORE_DEVICE_DTYPE=float32)"
                )
            # two-stage quantized scan: int8 MXU over-fetch (4k) on
            # device, then a re-rank of the candidate set. Where the
            # re-rank runs is INT8_RERANK (config.int8_rerank):
            #   "device" (default) — full-precision query x dequantized
            #     rows on device; the int8 matrix is the only
            #     corpus-sized array in the search path (1/4-memory
            #     serving; only the inherent row-quantization error
            #     remains — recall@10 vs true fp32 is measured by
            #     benchmarks/run.py config 7, not asserted here)
            #   "host" — exact fp32 re-rank against the host-resident
            #     matrix: bit-parity with the fp32 path at the cost of a
            #     host gather + einsum per batch
            if self.config.int8_rerank == "device":
                from ..ops.quantized import int8_search_device_rerank

                vals, idx = int8_search_device_rerank(
                    q_pad,
                    self._dev["corpus_q"],
                    self._dev["scale"],
                    self._dev["weights"],
                    self._dev["mask"],
                    k=k_pad,
                    method="approx" if method == "approx" else "exact",
                )
            else:
                from ..ops.quantized import int8_search

                k_fetch = min(4 * k_pad, self.num_entities)
                _, idx_q = int8_search(
                    q_pad,
                    self._dev["corpus_q"],
                    self._dev["scale"],
                    self._dev["weights"],
                    self._dev["mask"],
                    k=k_fetch,
                    method="approx" if method == "approx" else "exact",
                )
                q = np.asarray(q, dtype=np.float32)
                idx_q = np.asarray(idx_q)[:b]
                weights_h = self.corpus.level_weights(
                    self.config.level_weights
                )
                safe = np.clip(idx_q, 0, self.num_entities - 1)
                cand = self._vectors[safe]  # (b, k_fetch, D) host gather
                exact = np.einsum("bd,bkd->bk", q, cand) * weights_h[safe]
                exact = np.where(idx_q >= 0, exact, -np.inf)
                order = np.argsort(-exact, axis=1)[:, :k_eff]
                vals = np.take_along_axis(exact, order, axis=1)
                idx = np.take_along_axis(idx_q, order, axis=1)
                with self._searches_lock:
                    self._searches += b
                return PendingSearch(hits=self.build_hits(vals, idx))
        elif method == "chunkstream":
            # streaming chunk-select v2 (ops/chunk_stream.py): pass-1
            # chunk-max scan in the configured dtype (CHUNKSTREAM_SCAN),
            # pass-2 exact fp32 HIGHEST re-score of the selected 128-row
            # blocks. The huge-corpus serving path — the (B, N) score
            # matrix never materializes at fp32, and reduced-precision
            # scans halve/quarter the pass-1 HBM traffic with
            # measured-residual certificates. Uncertified batches
            # (near-ties at the chunk boundary) redo on the exact path.
            if (
                self._dev is None
                or "corpus" not in self._dev
                or str(self._dev["corpus"].dtype) != "float32"
            ):
                raise ValueError(
                    "chunkstream requires fp32 device residency "
                    "(STORE_DEVICE_DTYPE=float32)"
                )
            from ..ops import chunk_stream

            cs = self._ensure_chunkstore()
            scan = self.config.chunkstream_scan
            # knob grammar: engine[_dtype]. pallas/pallas_bf16/pallas_int8
            # run the streaming kernel over an fp32/bf16/int8 store (the
            # kernel adapts to the stored dtype — measured fastest at
            # every dtype, config 6 r4); bf16/int8 are the XLA-engine
            # spellings over the same reduced stores; xla/xla_high scan
            # fp32. The engine falls back to XLA off-TPU (no Mosaic),
            # KEEPING the reduced store dtype.
            engine = "pallas" if scan.startswith("pallas") else scan
            interpret = jax.default_backend() != "tpu"
            if interpret and engine == "pallas":
                engine = {
                    "pallas_bf16": "bf16", "pallas_int8": "int8",
                }.get(scan, "xla")
            vals, idx, cert = chunk_stream.search(
                cs, q_pad, k=k_pad, scan=engine, interpret=interpret
            )
        elif (
            method in ("fast", "chunk")
            and self._dev is not None
            and "corpus" in self._dev
            and str(self._dev["corpus"].dtype) == "float32"
        ):
            # certified chunk-select over a Precision.HIGH scan
            # (ops/rerank.py): ~1.5x the HIGHEST+top_k pipeline at
            # B=256/N=40k. Exactness is host-mediated: the per-query
            # certificate guarantees no unfetched row can beat the k-th;
            # an uncertified batch (near-ties at the candidate boundary)
            # transparently redoes on the exact path.
            from ..ops.rerank import chunk_select_search

            vals, idx, cert = chunk_select_search(
                q_pad,
                self._dev["corpus"],
                self._dev["weights"],
                self._dev["mask"],
                k=k_pad,
                scan_precision="high",
                guarantee=False,
                bound_scale=self._bound_scale,
            )
        elif _use_pallas():
            vals, idx = fused_search(
                q_pad,
                self._dev["corpus"],
                self._dev["weights"],
                self._dev["mask"],
                k=k_pad,
                tile_n=0,  # auto-size to VMEM budget
                method=method,
            )
        else:
            vals, idx = flat_search_jax(
                q_pad,
                self._dev["corpus"],
                self._dev["weights"],
                self._dev["mask"],
                k=k_pad,
                method=method,
            )
        def _finalize():
            v, i = vals, idx
            if cert is not None and not bool(np.asarray(cert).all()):
                # near-ties at the candidate boundary: redo the whole
                # batch on the exact path (the certified kernels'
                # host-mediated exactness contract)
                if _use_pallas():
                    v, i = fused_search(
                        q_pad, self._dev["corpus"], self._dev["weights"],
                        self._dev["mask"], k=k_pad, tile_n=0,
                    )
                else:
                    v, i = flat_search_jax(
                        q_pad, self._dev["corpus"], self._dev["weights"],
                        self._dev["mask"], k=k_pad,
                    )
            v = np.asarray(v)[:b, :k_eff]
            i = np.asarray(i)[:b, :k_eff]
            with self._searches_lock:
                self._searches += b
            return self.build_hits(v, i)

        return PendingSearch(finalize=_finalize)

    def build_hits(
        self, vals: np.ndarray, idx: np.ndarray
    ) -> List[List[SearchHit]]:
        """Materialize SearchHit rows from (values, indices) arrays —
        shared by the two-step path and the fused encode+search path."""
        weights = self.corpus.level_weights(self.config.level_weights)
        n = self.num_entities
        out: List[List[SearchHit]] = []
        for row_vals, row_idx in zip(np.asarray(vals), np.asarray(idx)):
            hits = []
            for val, j in zip(row_vals, row_idx):
                j = int(j)
                if j < 0 or j >= n:  # padding rows (sharded global ids)
                    continue
                w = float(weights[j]) or 1.0
                hits.append(
                    SearchHit(
                        id=j,
                        code=self.corpus.codes[j],
                        preferred_zh=self.corpus.titles[j],
                        score=float(val),
                        original_score=float(val) / w,
                        level=int(self.corpus.levels[j]),
                        parent_code=self.corpus.parent_codes[j],
                        category_path=self.corpus.category_paths[j],
                        semantic_text=self.corpus.semantic_texts[j],
                        main_code=self.corpus.main_codes[j],
                        secondary_code=self.corpus.secondary_codes[j],
                        has_complication=bool(self.corpus.has_complication[j]),
                    )
                )
            out.append(hits)
        return out

    # ------------------------------------------------------------- HNSW

    def build_hnsw(self, M: Optional[int] = None, ef_construction: Optional[int] = None):
        """Build (or return) the native C++ graph index over the corpus —
        the path for corpora beyond brute-force. Search applies the same
        level-weight×resort post-pass the flat path fuses on device."""
        if self._hnsw is not None and len(self._hnsw) == self.num_entities:
            return self._hnsw
        from .hnsw_index import HNSWIndex

        idx = HNSWIndex(
            dim=self.dim,
            M=M or self.hnsw_config.M,
            ef_construction=ef_construction or self.hnsw_config.ef_construction,
            vec_dtype=getattr(self.hnsw_config, "vec_dtype", "float32"),
        )
        idx.add(self._vectors)
        idx.compact()  # drop build-time allocation slack
        self._hnsw = idx
        return idx

    def _search_hnsw(
        self, q: np.ndarray, k_eff: int, ef_search: Optional[int] = None
    ) -> List[List[SearchHit]]:
        """Graph search with weighted-semantics parity: the flat path ranks
        by level-WEIGHTED score in-kernel, but the graph traverses raw IP,
        so a ×1.2 level-1 row can sit below the raw-IP top-k yet inside the
        weighted top-k. The graph over-fetches (starting at 2k, the factor
        the orchestrator uses before rescoring,
        multi_diagnosis_service.py:153) and then verifies a correctness
        bound per query: any UNfetched row has raw IP ≤ the last fetched
        raw IP, hence weighted score ≤ last_raw × max_weight; if the k-th
        weighted score already beats that bound, the weighted top-k is
        provably complete relative to the graph's raw ordering. Queries
        failing the bound refetch with doubled k.

        bf16 graphs (HNSW_VEC_DTYPE=bfloat16 — half the graph memory, ≤
        the flat fp32 footprint) return bf16-rounded IPs: the fetched
        candidates re-rank EXACTLY against the host fp32 matrix, and the
        completeness bound widens by the bf16 dot error so rounding can
        never hide an unfetched winner AMONG THE ROWS THE TRAVERSAL
        VISITED.

        Candidate-selection caveat (measured, round 3/4): both bounds are
        relative to the graph's raw ordering — a row the greedy descent
        never reached is outside their reach, which is inherent to HNSW
        (approximate even at fp32). bf16 traversal adds a small
        permanent exclusion ceiling: on the trained 40k embeddings the
        bf16 graph plateaus at recall@10 ≈ 0.998 for ef in [32, 256]
        (0.995 @ ef16), where the fp32 graph reaches 1.0 at ef ≥ 32 —
        the re-rank fixes fetched candidates' SCORES but cannot recover
        a neighbor the rounded descent steered away from. Callers
        needing exactness should use the flat methods (exact /
        chunkstream), which are certificate-backed."""
        idx = self.build_hnsw()
        weights = self.corpus.level_weights(self.config.level_weights)
        max_w = float(np.max(self.config.level_weights))
        min_w = float(np.min(self.config.level_weights))
        n = self.num_entities
        is_bf16 = getattr(idx, "vec_dtype", "float32") == "bfloat16"
        if is_bf16:
            from ..ops.rerank import EPS_BF16_DOT

            q_norms = np.linalg.norm(q, axis=1)
            # unweighted max row norm (NOT _bound_scale/max_w: _bound_scale
            # folds the max PER-ROW weight present, which can be below the
            # config max_w, and dividing by max_w would then underestimate
            # the true max row norm and unsound the widened bound)
            c_norm_max = (
                self._max_row_norm
                if getattr(self, "_max_row_norm", None)
                else float(np.linalg.norm(self._vectors, axis=1).max())
            )
            eps_rows = (EPS_BF16_DOT * c_norm_max) * q_norms  # (B,)
        k_fetch = min(2 * k_eff, n)
        while True:
            ef = max(ef_search or self.hnsw_config.ef_search, k_fetch)
            ips, ids = idx.search(q, k_fetch, ef)
            valid = ids >= 0
            if is_bf16:
                # exact fp32 re-rank of the fetched candidate rows (the
                # candidate set stays tiny; the graph only chose it)
                safe = np.clip(ids, 0, n - 1)
                cand = self._vectors[safe]  # (B, k_fetch, D)
                ips = np.where(
                    valid, np.einsum("bd,bkd->bk", q, cand), ips
                ).astype(np.float32)
            if k_fetch >= n:
                break
            w_rows = np.where(valid, weights[np.clip(ids, 0, n - 1)], 0.0)
            weighted = np.where(valid, ips * w_rows, -np.inf)
            kth_weighted = -np.sort(-weighted, axis=1)[:, k_eff - 1]
            last_raw = np.where(valid, ips, np.inf).min(axis=1)
            if is_bf16:
                # unfetched rows are ordered by bf16 IP; their TRUE IP can
                # exceed the last fetched TRUE IP by 2x the bf16 dot error
                last_raw = last_raw + 2.0 * eps_rows
            # any unfetched row has raw IP <= last_raw; its weighted score
            # is bounded by last_raw*max_w when last_raw >= 0 but by
            # last_raw*MIN_w when negative (a negative score shrinks
            # toward zero under a small weight)
            bound = np.where(last_raw >= 0, last_raw * max_w, last_raw * min_w)
            if np.all(kth_weighted >= bound - 1e-6):
                break
            k_fetch = min(2 * k_fetch, n)
        with self._searches_lock:
            self._searches += q.shape[0]
        out: List[List[SearchHit]] = []
        for row_ips, row_ids in zip(ips, ids):
            hits = []
            for ip, j in zip(row_ips, row_ids):
                j = int(j)
                if j < 0:
                    continue
                w = float(weights[j]) or 1.0
                hits.append(
                    SearchHit(
                        id=j,
                        code=self.corpus.codes[j],
                        preferred_zh=self.corpus.titles[j],
                        score=float(ip) * w,
                        original_score=float(ip),
                        level=int(self.corpus.levels[j]),
                        parent_code=self.corpus.parent_codes[j],
                        category_path=self.corpus.category_paths[j],
                        semantic_text=self.corpus.semantic_texts[j],
                        main_code=self.corpus.main_codes[j],
                        secondary_code=self.corpus.secondary_codes[j],
                        has_complication=bool(self.corpus.has_complication[j]),
                    )
                )
            hits.sort(key=lambda h: h.score, reverse=True)
            out.append(hits[:k_eff])
        return out

    def semantic_similarities(
        self, query_vectors: np.ndarray, candidate_ids: np.ndarray
    ) -> np.ndarray:
        """Cosine(query, semantic_text embedding) for candidate rows —
        device-side gather + dot replacing the reference's 2-forwards-per-
        candidate re-embedding (hierarchical_similarity_service.py:387-409).

        query_vectors: (B, D); candidate_ids: (B, K) -> (B, K) fp32.
        """
        src = (
            self._semantic_vectors
            if self._semantic_vectors is not None
            else self._vectors
        )
        if src is None:
            return np.zeros(candidate_ids.shape, dtype=np.float32)
        q = np.atleast_2d(np.asarray(query_vectors, np.float32))
        cand = src[np.asarray(candidate_ids, np.int64)]  # (B, K, D)
        return np.einsum("bd,bkd->bk", q, cand).astype(np.float32)

    # ------------------------------------------------------------ stats

    def get_collection_stats(self) -> Dict:
        """Reference analog: milvus_service.py:457-496."""
        return {
            "collection_name": self.config.collection_name,
            "num_entities": self.num_entities,
            "dim": self.dim,
            "index_type": self.config.index_type,
            "metric_type": self.config.metric_type,
            "search_method": self.config.search_method,
            "index_params": {
                "M": self.hnsw_config.M,
                "ef_construction": self.hnsw_config.ef_construction,
                "ef_search": self.hnsw_config.ef_search,
            },
            "loaded": self._loaded,
            "searches_served": self._searches,
            "memory": self.get_memory_usage(),
        }

    def get_memory_usage(self) -> Dict:
        """Estimate = n·dim·4 bytes (formula parity: milvus_service.py:515);
        ``device_vector_bytes`` is the ACTUAL residency cost under the
        configured dtype (bf16 halves, int8 quarters + per-row scales)."""
        vector_bytes = self.num_entities * self.dim * 4
        per_elem = {"float32": 4, "bfloat16": 2, "int8": 1}.get(
            self.config.device_dtype, 4
        )
        device_bytes = self.num_entities * self.dim * per_elem
        if self.config.device_dtype == "int8":
            device_bytes += self.num_entities * 4  # per-row scales
        if self.config.device_dtype == "host":
            # capacity tier: only the sketch screen is device-resident
            device_bytes = (
                self._sketch.device_bytes
                if self._sketch is not None
                else self.num_entities * (self.config.sketch_dim + 12)
            )
        return {
            "num_entities": self.num_entities,
            "dim": self.dim,
            "estimated_vector_memory_bytes": vector_bytes,
            "estimated_vector_memory_mb": round(vector_bytes / 1024 / 1024, 2),
            "device_vector_bytes": device_bytes,
            "device_vector_mb": round(device_bytes / 1024 / 1024, 2),
            "device_resident": self._loaded,
            "device_dtype": self.config.device_dtype,
            "sharded": self._sharded is not None,
        }

    def health_check(self) -> Dict:
        """Reference analog: milvus_service.py:524-549."""
        status = "healthy"
        checks = {
            "has_data": self.num_entities > 0,
            "device_loaded": self._loaded,
            "device_reachable": True,
        }
        try:
            jax.devices()
        except Exception:
            checks["device_reachable"] = False
        if not all(checks.values()):
            status = "degraded" if checks["has_data"] else "unhealthy"
        return {"status": status, "checks": checks, "num_entities": self.num_entities}

    def test_connection(self) -> bool:
        try:
            return len(jax.devices()) > 0
        except Exception:
            return False

    # ------------------------------------------------------------- persist

    def save(self, path: Optional[str] = None) -> str:
        """Persist vectors (.npz) + metadata (.json) (replaces the Milvus
        Lite DB file; SURVEY.md §5 checkpoint/resume)."""
        base = Path(path or self.config.db_path)
        base.parent.mkdir(parents=True, exist_ok=True)
        arrays = {"vectors": self._vectors}
        if self._semantic_vectors is not None:
            arrays["semantic_vectors"] = self._semantic_vectors
        np.savez(str(base) + ".npz", **arrays)
        self.corpus.to_json(str(base) + ".meta.json")
        if self._hnsw is not None:
            self._hnsw.save(str(base) + ".hnsw")
        manifest = {
            "collection_name": self.config.collection_name,
            "dim": self.dim,
            "num_entities": self.num_entities,
            "index_type": self.config.index_type,
            "metric_type": self.config.metric_type,
            "created_at": self._created_at,
            "saved_at": time.time(),
        }
        Path(str(base) + ".manifest.json").write_text(json.dumps(manifest))
        return str(base)

    @classmethod
    def load(
        cls,
        path: str,
        config: Optional[StoreConfig] = None,
        hnsw_config=None,
    ) -> "VectorStore":
        manifest = json.loads(Path(path + ".manifest.json").read_text())
        store = cls(dim=manifest["dim"], config=config, hnsw_config=hnsw_config)
        data = np.load(path + ".npz")
        store._vectors = data["vectors"]
        if "semantic_vectors" in data:
            store._semantic_vectors = data["semantic_vectors"]
        store.corpus = ICDCorpus.from_json(path + ".meta.json")
        hnsw_path = Path(path + ".hnsw")
        if hnsw_path.exists():
            try:
                from .hnsw_index import HNSWIndex

                store._hnsw = HNSWIndex.load(str(hnsw_path))
            except Exception:
                store._hnsw = None  # rebuilt lazily on demand
        return store

    @staticmethod
    def exists(path: str) -> bool:
        return Path(path + ".npz").exists() and Path(path + ".meta.json").exists()
