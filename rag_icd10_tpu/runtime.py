"""Engine: the service container wiring encoder, store and pipeline.

Replaces the reference's module-level singletons + lifespan init
(reference: main.py:25-28,31-105 — Embedding -> Milvus -> LLM ->
MultiDiagnosis, with non-fatal LLM test). Initialization order and the
degradation ladder are preserved; construction is explicit instead of
global.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Optional

from .config import Config, get_config
from .data.corpus import load_corpus
from .index.vector_store import VectorStore
from .models.encoder import TextEncoder
from .models.tokenizer import WordPieceTokenizer
from .pipeline.llm import LLMService
from .pipeline.ner import MedicalNERService
from .pipeline.orchestrator import MultiDiagnosisService
from .pipeline.textproc import DiagnosisTextProcessor

logger = logging.getLogger("rag_icd10_tpu")


class Engine:
    """Lazily-wired service graph with the reference's init order."""

    def __init__(self, config: Optional[Config] = None):
        from .utils import enable_compile_cache

        enable_compile_cache()
        self.config = config or get_config()
        self.encoder: Optional[TextEncoder] = None
        self.store: Optional[VectorStore] = None
        self.llm: Optional[LLMService] = None
        self.ner: Optional[MedicalNERService] = None
        self.matcher: Optional[MultiDiagnosisService] = None
        self.started_at = time.time()
        self.llm_status: dict = {}

    # ----------------------------------------------------------- builders

    def _encoder_sidecar(self) -> dict:
        """The builder records which encoder produced the persisted store
        (<db>.encoder.json); serving defaults to those weights so queries
        and corpus vectors can never silently mismatch."""
        import json

        path = Path(str(self.config.store.db_path) + ".encoder.json")
        if path.exists():
            try:
                sidecar = json.loads(path.read_text())
                # older sidecars may hold relative paths; resolve them
                # against the store's parent directory's parent (repo root
                # convention: db/... lives next to the store)
                for key in ("weights_path", "vocab_path"):
                    p = sidecar.get(key)
                    if p and not Path(p).is_absolute() and not Path(p).exists():
                        candidate = path.parent.parent / p
                        if candidate.exists():
                            sidecar[key] = str(candidate)
                return sidecar
            except (OSError, json.JSONDecodeError):
                pass
        return {}

    def _tokenizer(self) -> WordPieceTokenizer:
        cfg = self.config
        vocab_path = (
            cfg.encoder.vocab_path
            or self._encoder_sidecar().get("vocab_path")
            or str(Path(cfg.store.db_path).with_suffix("")) + ".vocab.txt"
        )
        if Path(vocab_path).exists():
            return WordPieceTokenizer.from_vocab_file(vocab_path)
        corpus = load_corpus(cfg.data_path)
        tok = WordPieceTokenizer.from_corpus(corpus.titles + corpus.semantic_texts)
        try:
            tok.save_vocab(vocab_path)
        except OSError:
            pass
        return tok

    def init_encoder(self) -> TextEncoder:
        if self.encoder is None:
            cfg = self.config.encoder
            sidecar = self._encoder_sidecar()
            if not cfg.weights_path and sidecar.get("weights_path"):
                if Path(sidecar["weights_path"]).exists():
                    import dataclasses

                    logger.info(
                        "using store's encoder weights: %s", sidecar["weights_path"]
                    )
                    cfg = dataclasses.replace(
                        cfg, weights_path=sidecar["weights_path"]
                    )
                else:
                    logger.warning(
                        "store was built with weights %s which no longer "
                        "exist — queries may mismatch the corpus vectors",
                        sidecar["weights_path"],
                    )
            logger.info("initializing encoder (%s)", cfg.model_name)
            self.encoder = TextEncoder(cfg, tokenizer=self._tokenizer())
        return self.encoder

    def init_store(self, load: bool = True) -> VectorStore:
        if self.store is None:
            cfg = self.config.store
            if cfg.mode in ("remote", "server") and cfg.server_url:
                # share a peer API server's device-resident corpus
                # (reference: MILVUS_MODE=server, milvus_service.py:57-118)
                from .data.corpus import load_corpus
                from .index.remote_store import RemoteVectorStore

                logger.info("remote store mode -> %s", cfg.server_url)
                # corpus=None (NOT load_corpus's synthetic fallback —
                # fake titles would silently poison the terminology
                # cache) when the real CSV is absent: remote hits carry
                # all metadata and corpus-wide features degrade cleanly
                corpus = None
                from pathlib import Path as _Path

                if self.config.data_path and _Path(self.config.data_path).exists():
                    corpus = load_corpus(self.config.data_path)
                else:
                    logger.warning(
                        "no local corpus CSV — remote hits carry all "
                        "metadata; terminology features degrade gracefully"
                    )
                self.store = RemoteVectorStore(cfg.server_url, corpus=corpus)
                return self.store
            base = self.config.store.db_path
            if VectorStore.exists(base):
                logger.info("loading persisted store from %s", base)
                self.store = VectorStore.load(
                    base, config=self.config.store, hnsw_config=self.config.hnsw
                )
            else:
                logger.warning("no persisted store at %s — empty collection", base)
                self.store = VectorStore(
                    dim=self.config.encoder.hidden_size,
                    config=self.config.store,
                    hnsw_config=self.config.hnsw,
                )
            if load and self.store.num_entities:
                self.store.load_collection()
        return self.store

    def init_llm(self) -> LLMService:
        if self.llm is None:
            self.llm = LLMService(self.config.llm)
        return self.llm

    def init_matcher(self) -> MultiDiagnosisService:
        if self.matcher is None:
            encoder = self.init_encoder()
            store = self.init_store()
            self.ner = MedicalNERService(self.config.ner)
            self.matcher = MultiDiagnosisService(
                encoder=encoder,
                store=store,
                ner_service=self.ner,
                text_processor=DiagnosisTextProcessor(
                    encoder=encoder,
                    use_enhanced_processing=self.config.pipeline.use_enhanced_text_processing,
                    ner_service=self.ner,
                ),
                overfetch=self.config.pipeline.overfetch,
            )
        return self.matcher

    def startup(self, test_llm: bool = False, warmup: bool = True) -> None:
        """Full init in the reference's order; LLM test is non-fatal
        (main.py:69-89)."""
        self.init_encoder()
        self.init_store()
        self.init_llm()
        if test_llm:
            try:
                self.llm_status = self.llm.test_connection()
            except Exception as e:
                self.llm_status = {"connected": False, "error": str(e)}
        self.init_matcher()
        if warmup and self.store.num_entities:
            self.warmup()

    def warmup(self) -> None:
        """Pre-compile the serving shapes (encoder buckets, search k/batch
        grid) so the first user request doesn't pay minutes of XLA
        compiles. Covers EVERY power-of-two coalesced-batch bucket the
        batcher can produce up to max_batch (a load level hitting an
        uncovered bucket mid-run used to pay a one-time ~10s p95 spike),
        for both common top_k values (5, 10 -> k buckets 16, 32)."""
        t0 = time.time()
        logger.info("warmup: compiling serving shapes...")
        try:
            for text in ("急性胃肠炎", "急性胃肠炎，高血压病3级，2型糖尿病"):
                for top_k in (5, 10):
                    self.matcher.match_many_texts([text], top_k=top_k)
            seeds = ["急性胃肠炎", "高血压病3级", "疑似肺部感染", "2型糖尿病",
                     "慢性阻塞性肺疾病急性加重，冠状动脉粥样硬化性心脏病"]
            size, max_rows = 2, max(self.config.api.max_batch, 8)
            sizes = []
            while size <= max_rows:
                sizes.append(size)
                size *= 2
            # multi-diagnosis seeds can push flat sub-diagnosis rows one
            # pow2 bucket past max_batch — cover it too
            sizes.append(max_rows * 2)
            for size in sizes:
                batch = (seeds * ((size // len(seeds)) + 1))[:size]
                for top_k in (5, 10):
                    self.matcher.match_many_texts(batch, top_k=top_k)
            self._warmup_extra_methods([1] + sizes)
        except Exception as e:
            logger.warning("warmup failed (continuing): %s", e)
        logger.info("warmup done in %.0fs", time.time() - t0)

    def _warmup_extra_methods(self, sizes) -> None:
        """Pre-compile/pre-build the opt-in per-request search methods
        (WARMUP_SEARCH_METHODS) so the first `search_method=streaming`
        request doesn't pay a per-bucket Pallas compile and the first
        `search_method=hnsw` request doesn't pay a graph build. Drives
        `store.search` directly with random unit vectors — the XLA cache
        keys on shapes, not values, and the encoder buckets are already
        warm from the main sweep."""
        import numpy as np

        methods = [
            m.strip().lower()
            for m in self.config.api.warmup_methods.split(",")
            if m.strip()
        ]
        if not methods or self.store is None or not self.store.num_entities:
            return
        overfetch = self.config.pipeline.overfetch
        rng = np.random.default_rng(0)
        host_tier = (
            getattr(self.store.config, "device_dtype", "") == "host"
        )
        if host_tier and not any(m in ("sketch", "hnsw") for m in methods):
            # the default 'fast,streaming' list has nothing servable on
            # the host tier — warm the method it will actually serve
            methods.append("sketch")
        for method in methods:
            if host_tier and method not in ("sketch", "hnsw"):
                # the host tier serves only sketch/hnsw (vector_store
                # residency guard); warming the default 'fast,streaming'
                # list would raise and abort the rest of the sweep
                logger.info(
                    "warmup: skipping method=%s (host-tier store serves "
                    "sketch/hnsw only)", method,
                )
                continue
            t0 = time.time()
            if method == "hnsw":
                self.store.build_hnsw()
            elif method in ("streaming", "chunkstream", "sketch", "approx",
                            "exact", "fast"):
                for size in sizes:
                    q = rng.standard_normal((size, self.store.dim)).astype(
                        np.float32
                    )
                    q /= np.linalg.norm(q, axis=1, keepdims=True)
                    for top_k in (5, 10):
                        self.store.search(q, top_k * overfetch, method=method)
            else:
                logger.warning("unknown WARMUP_SEARCH_METHODS entry: %s", method)
                continue
            logger.info(
                "warmup(%s) done in %.0fs", method, time.time() - t0
            )

    def shutdown(self) -> None:
        """Cleanup (reference: main.py:118-226): release device memory,
        close clients."""
        if self.store is not None:
            self.store.release_collection()
        if self.llm is not None:
            self.llm.close()
