"""Retrieval-quality eval harness tests.

The harness itself must be trustworthy: deterministic case generation,
no TRAIN-class transforms leaking into eval tiers, title-level gold
semantics (duplicate titles count as correct), and a sane report shape.
"""

import numpy as np
import pytest

from rag_icd10_tpu.config import NERConfig, StoreConfig
from rag_icd10_tpu.data.augment import (
    SYNONYM_PAIRS,
    eval_synonyms,
    train_synonyms,
)
from rag_icd10_tpu.data.corpus import ICDCorpus, synthetic_corpus
from rag_icd10_tpu.eval.retrieval import (
    CANONICAL_TEXTS,
    build_eval_set,
    evaluate,
    run_canonical,
)
from rag_icd10_tpu.index import VectorStore
from rag_icd10_tpu.pipeline.ner import MedicalNERService
from rag_icd10_tpu.pipeline.orchestrator import MultiDiagnosisService
from rag_icd10_tpu.pipeline.textproc import DiagnosisTextProcessor

from test_orchestrator import CORPUS_ROWS, MockEncoder


class TitleLookupEncoder(MockEncoder):
    """Maps a text to the embedding of the corpus record whose title it
    contains (longest match) — a 'perfect retriever' for harness tests."""

    def __init__(self, corpus, vectors):
        self.titles = list(corpus.titles)
        self.vectors = vectors

    def _vec(self, text):
        best, best_len = None, 0
        for i, t in enumerate(self.titles):
            if t in text and len(t) > best_len:
                best, best_len = i, len(t)
        if best is None:
            return super()._vec(text)
        return self.vectors[best]


@pytest.fixture(scope="module")
def corpus():
    return synthetic_corpus(300, seed=77)


class TestSplitIntegrity:
    def test_synonym_split_partitions(self):
        from rag_icd10_tpu.data.augment import TRAIN_ONLY_SYNONYM_PAIRS

        tr, ev = train_synonyms(), eval_synonyms()
        assert set(tr) | set(ev) == set(SYNONYM_PAIRS) | set(
            TRAIN_ONLY_SYNONYM_PAIRS)
        assert not (set(tr) & set(ev))
        assert len(ev) >= 10  # enough eval templates
        # the round-4 expansion is train-only: eval membership stays frozen
        # at the original SYNONYM_PAIRS md5 split, so eval numbers remain
        # comparable across vocabulary edits
        assert not (set(ev) & set(TRAIN_ONLY_SYNONYM_PAIRS))
        assert set(ev) == {p for p in SYNONYM_PAIRS if p in set(ev)}

    def test_no_degenerate_synonym_pairs(self):
        from rag_icd10_tpu.data.augment import TRAIN_ONLY_SYNONYM_PAIRS

        for formal, variant in SYNONYM_PAIRS + TRAIN_ONLY_SYNONYM_PAIRS:
            assert formal != variant, (formal, variant)
            assert formal and variant

    def test_apply_synonym_corruption_guard(self):
        """formal-in-variant pairs must not double the suffix on titles
        that already contain the variant (骨质疏松症 -> 骨质疏松症症),
        while variant-in-formal abbreviations (脑梗死 -> 脑梗) must stay
        applicable."""
        from rag_icd10_tpu.data.augment import apply_synonym

        pairs = [("骨质疏松", "骨质疏松症")]
        assert apply_synonym("绝经后骨质疏松症", pairs) is None
        assert apply_synonym("老年性骨质疏松", pairs) == "老年性骨质疏松症"
        abbr = [("脑梗死", "脑梗")]
        assert apply_synonym("急性脑梗死", abbr) == "急性脑梗"

    def test_train_transforms_stay_out_of_eval_classes(self):
        """New TRAIN-class transforms must not reproduce an EVAL-class
        output: connective swap / abbrev expansion / marker wrap never
        equal a char swap, laterality drop, or eval-half synonym of the
        same title."""
        import numpy as np

        from rag_icd10_tpu.data.augment import (
            augment_train,
            eval_synonyms,
            wrap_uncertainty,
        )

        rng = np.random.default_rng(3)
        titles = ["左侧肺恶性肿瘤", "胃溃疡伴出血", "急性阑尾炎",
                  "系统性红斑狼疮", "2型糖尿病伴酮症酸中毒"]
        ev_syn = eval_synonyms()
        for t in titles:
            evalish = {v for f, v in ev_syn if f in t}
            for _ in range(50):
                out = augment_train(t, rng)
                if out:
                    assert out not in evalish, (t, out)

    def test_new_train_transforms(self):
        import numpy as np

        from rag_icd10_tpu.data.augment import (
            augmentation_charset_texts,
            expand_abbrev,
            swap_connective,
            wrap_uncertainty,
        )

        assert swap_connective("胃溃疡伴出血") == "出血伴胃溃疡"
        assert swap_connective("高血压") is None
        assert expand_abbrev("冠心病") == "冠状动脉粥样硬化性心脏病"
        rng = np.random.default_rng(0)
        wrapped = {wrap_uncertainty("肺炎", rng) for _ in range(40)}
        assert "疑似肺炎" in wrapped and "肺炎待查" in wrapped
        # charset texts cover marker + variant chars absent from ICD text
        blob = "".join(augmentation_charset_texts())
        for ch in "疑似待查蛀":
            assert ch in blob, ch

    def test_eval_set_deterministic(self, corpus):
        a = build_eval_set(corpus, seed=5)
        b = build_eval_set(corpus, seed=5)
        for ta, tb in zip(a, b):
            assert [c.query for c in ta.cases] == [c.query for c in tb.cases]

    def test_tiers_present(self, corpus):
        tiers = {t.name: t for t in build_eval_set(corpus)}
        assert set(tiers) == {
            "exact_title", "paraphrase", "uncertainty", "multi_diagnosis"}
        assert tiers["exact_title"].cases
        assert tiers["uncertainty"].cases
        # every uncertainty query carries a marker around a real title
        for c in tiers["uncertainty"].cases[:20]:
            assert c.source_title in c.query
            assert c.query != c.source_title

    def test_exact_tier_admits_separator_titles(self):
        # the exact tier samples from ALL titles (extraction's exact-title
        # bypass makes comma/paren titles fair queries); transformed tiers
        # keep the separator exclusion
        from rag_icd10_tpu.data.corpus import ICDCorpus as C

        rows = [{"code": f"A{i:02d}", "disease": t} for i, t in enumerate([
            "肺结核,经组织学所证实",
            "急性胃肠炎",
            "高血压病",
            "慢性支气管炎",
            "继发性肺结核(初治,耐多药)涂阳培阳",
            "糖尿病性白内障",
        ])]
        corpus = C.from_rows(rows)
        tiers = {t.name: t for t in build_eval_set(
            corpus, n_exact=6, n_paraphrase=2, n_uncertainty=2, n_multi=2)}
        exact_queries = {c.query for c in tiers["exact_title"].cases}
        assert "肺结核,经组织学所证实" in exact_queries
        for c in tiers["uncertainty"].cases:
            assert "," not in c.source_title

    def test_multi_pool_excludes_merge_prone_titles(self, corpus):
        # no multi part may be a connection/qualifier-shaped title the
        # boundary detector would merge into its predecessor
        from rag_icd10_tpu.pipeline.boundary import (
            CONNECTION_PATTERNS, DISEASE_TERM_RE, QUALIFIER_TAIL_RE)
        tiers = {t.name: t for t in build_eval_set(corpus)}
        for c in tiers["multi_diagnosis"].cases:
            t = c.source_title
            assert not any(p.search(t) for p in CONNECTION_PATTERNS), t
            assert not (QUALIFIER_TAIL_RE.search(t)
                        and not DISEASE_TERM_RE.search(t)), t

    def test_paraphrase_queries_differ_from_titles(self, corpus):
        # synthetic corpus rarely hits synonym/laterality; real corpus does.
        # char-swap fallback must still produce variants != any gold title.
        tiers = {t.name: t for t in build_eval_set(corpus)}
        for c in tiers["paraphrase"].cases:
            assert c.query not in c.gold_titles


class TestEvaluate:
    def _setup(self):
        corpus = ICDCorpus.from_rows(CORPUS_ROWS)
        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((len(corpus), 64)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        enc = TitleLookupEncoder(corpus, vecs)
        store = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
        store.insert_records(list(corpus.records()), vecs)
        return enc, store, corpus

    def test_perfect_retriever_scores_one(self):
        enc, store, corpus = self._setup()
        tiers = build_eval_set(
            corpus, n_exact=8, n_paraphrase=0, n_uncertainty=8, n_multi=0)
        report = evaluate(enc, store, tiers=tiers, top_k=5)
        t = report["tiers"]
        assert t["exact_title"]["recall@1"] == 1.0
        # markers still CONTAIN the title -> the lookup encoder resolves it
        assert t["uncertainty"]["recall@1"] == 1.0
        assert t["exact_title"]["n"] == 8

    def test_duplicate_titles_count_as_correct(self):
        rows = CORPUS_ROWS + [{"code": "K52.905", "disease": "急性胃肠炎"}]
        corpus = ICDCorpus.from_rows(rows)
        rng = np.random.default_rng(4)
        vecs = rng.standard_normal((len(corpus), 64)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        # query resolves to the OTHER duplicate's vector
        dup_a = corpus.titles.index("急性胃肠炎")
        enc = TitleLookupEncoder(corpus, vecs)
        store = VectorStore(dim=64, config=StoreConfig(pad_multiple=128))
        store.insert_records(list(corpus.records()), vecs)
        from rag_icd10_tpu.eval.retrieval import EvalCase, EvalTier

        tier = EvalTier("exact_title", [
            EvalCase("急性胃肠炎", {"急性胃肠炎"}, "急性胃肠炎")])
        report = evaluate(enc, store, tiers=[tier], top_k=5)
        assert report["tiers"]["exact_title"]["recall@1"] == 1.0
        assert dup_a >= 0  # sanity

    def test_full_pipeline_tiers(self):
        enc, store, corpus = self._setup()
        ner = MedicalNERService(NERConfig(use_model=False))
        matcher = MultiDiagnosisService(
            encoder=enc, store=store, ner_service=ner,
            text_processor=DiagnosisTextProcessor(
                use_enhanced_processing=True, ner_service=ner),
        )
        tiers = build_eval_set(
            corpus, n_exact=4, n_paraphrase=0, n_uncertainty=4, n_multi=4)
        report = evaluate(enc, store, matcher=matcher, tiers=tiers, top_k=5)
        t = report["tiers"]
        assert "pipeline_top1" in t["exact_title"]
        assert t["exact_title"]["pipeline_top1"] == 1.0
        assert "sub_diagnosis_top1" in t["multi_diagnosis"]
        assert t["multi_diagnosis"]["avg_extracted"] >= 1

    def test_canonical_report_rows(self):
        enc, store, corpus = self._setup()
        ner = MedicalNERService(NERConfig(use_model=False))
        matcher = MultiDiagnosisService(
            encoder=enc, store=store, ner_service=ner,
            text_processor=DiagnosisTextProcessor(
                use_enhanced_processing=True, ner_service=ner),
        )
        rows = run_canonical(matcher)
        assert len(rows) == len(CANONICAL_TEXTS)
        for r in rows:
            assert set(r) == {"text", "extracted", "top1"}
