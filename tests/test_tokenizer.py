"""WordPiece tokenizer tests, incl. parity vs HF BertTokenizerFast."""

import numpy as np
import pytest

from rag_icd10_tpu.models.tokenizer import (
    WordPieceTokenizer,
    basic_tokenize,
)


@pytest.fixture(scope="module")
def tok():
    texts = ["急性胃肠炎", "高血压病3级", "2型糖尿病", "abc def COPD"]
    return WordPieceTokenizer.from_corpus(texts)


class TestBasicTokenize:
    def test_cjk_split_per_char(self):
        assert basic_tokenize("急性胃肠炎") == ["急", "性", "胃", "肠", "炎"]

    def test_mixed_cjk_ascii(self):
        assert basic_tokenize("高血压3级") == ["高", "血", "压", "3", "级"]

    def test_punctuation_split(self):
        assert basic_tokenize("a,b") == ["a", ",", "b"]

    def test_lowercase(self):
        assert basic_tokenize("COPD") == ["copd"]

    def test_control_chars_removed(self):
        assert basic_tokenize("a\x00b") == ["ab"]


class TestEncode:
    def test_cls_sep_framing(self, tok):
        ids = tok.encode("急性胃肠炎")
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
        assert len(ids) == 7  # CLS + 5 chars + SEP

    def test_truncation(self, tok):
        ids = tok.encode("急性胃肠炎" * 100, max_length=16)
        assert len(ids) == 16 and ids[-1] == tok.sep_id

    def test_unknown_char_maps_to_unk(self, tok):
        ids = tok.encode("ᚠ")
        assert tok.unk_id in ids

    def test_batch_shapes_bucketed(self, tok):
        ids, mask, types = tok.encode_batch(
            ["急性胃肠炎", "高血压病3级伴心衰"], buckets=(16, 32), max_length=32
        )
        assert ids.shape == (2, 16)
        assert mask.sum(axis=1).tolist() == [7, 11]
        assert types.sum() == 0

    def test_batch_row_padding(self, tok):
        ids, mask, _ = tok.encode_batch(
            ["急性胃肠炎"] * 3, buckets=(16,), max_length=16, pad_batch_to=8
        )
        assert ids.shape == (8, 16)
        assert mask[3:].sum() == 0

    def test_vocab_roundtrip(self, tok, tmp_path):
        p = tmp_path / "vocab.txt"
        tok.save_vocab(str(p))
        tok2 = WordPieceTokenizer.from_vocab_file(str(p))
        assert tok2.vocab == tok.vocab
        assert tok2.encode("急性胃肠炎") == tok.encode("急性胃肠炎")


class TestHFParity:
    """Our WordPiece must match HF's BertTokenizer on a shared vocab."""

    def test_matches_hf_wordpiece(self, tmp_path):
        transformers = pytest.importorskip("transformers")
        texts = [
            "急性胃肠炎，高血压病3级",
            "2型糖尿病伴酮症酸中毒",
            "COPD急性加重期 123mg",
            "冠状动脉粥样硬化性心脏病？",
        ]
        ours = WordPieceTokenizer.from_corpus(texts)
        vocab_path = tmp_path / "vocab.txt"
        ours.save_vocab(str(vocab_path))
        hf = transformers.BertTokenizerFast(
            vocab_file=str(vocab_path), do_lower_case=True
        )
        for t in texts:
            hf_ids = hf(t, add_special_tokens=True)["input_ids"]
            assert ours.encode(t) == hf_ids, t
