"""Golden-file API contract tests.

Serializes reference-shaped /query, /standardize and /entities responses
(documented request/response pairs: reference CLAUDE.md:76-99,
README.md:135-153) from the deterministic mock engine and asserts them
against checked-in fixtures — field names, types, AND values (scores are
part of the observable contract: level weighting, 1.8 cap, 0.95 LLM
fallback cap, CLAUDE.md "Score semantics to preserve").

Regenerate after an INTENTIONAL contract change:
    GOLDEN_REGEN=1 python -m pytest tests/test_golden_api.py -q
then review the fixture diff like any other code change.
"""

import json
import math
import os
from pathlib import Path

import pytest

from test_api import client, get, post  # noqa: F401  (fixture reuse)

GOLDEN_DIR = Path(__file__).parent / "golden"
REGEN = os.getenv("GOLDEN_REGEN", "") == "1"

CASES = [
    (
        "query_multi",
        "/query",
        {"text": "急性胃肠炎，高血压病3级", "top_k": 3},
    ),
    (
        "query_single",
        "/query",
        {"text": "急性胃肠炎", "top_k": 5},
    ),
    (
        "standardize_multi",
        "/standardize",
        {"text": "急性胃肠炎，高血压病3级", "top_k": 5,
         "llm_provider": "deepseek"},
    ),
    (
        "entities",
        "/entities",
        {"text": "患者急性胃肠炎伴发热", "filter_drugs": True},
    ),
]


def _round_floats(obj, nd=4):
    if isinstance(obj, float):
        if math.isnan(obj) or math.isinf(obj):
            return str(obj)
        return round(obj, nd)
    if isinstance(obj, dict):
        return {k: _round_floats(v, nd) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_round_floats(v, nd) for v in obj]
    return obj


def _diff(path, a, b, out):
    if type(a) is not type(b):
        out.append(f"{path}: type {type(a).__name__} != {type(b).__name__}")
        return
    if isinstance(a, dict):
        for k in a.keys() | b.keys():
            if k not in a:
                out.append(f"{path}.{k}: missing in golden")
            elif k not in b:
                out.append(f"{path}.{k}: missing in response")
            else:
                _diff(f"{path}.{k}", a[k], b[k], out)
    elif isinstance(a, list):
        if len(a) != len(b):
            out.append(f"{path}: length {len(a)} != {len(b)}")
        for i, (x, y) in enumerate(zip(a, b)):
            _diff(f"{path}[{i}]", x, y, out)
    elif isinstance(a, float) or isinstance(b, float):
        if abs(float(a) - float(b)) > 1e-3:
            out.append(f"{path}: {a} != {b}")
    elif a != b:
        out.append(f"{path}: {a!r} != {b!r}")


@pytest.mark.parametrize("name,path,payload", CASES, ids=[c[0] for c in CASES])
def test_golden(client, name, path, payload):  # noqa: F811
    status, resp = post(client, path, payload)
    assert status == 200, resp
    resp = _round_floats(resp)
    fixture = GOLDEN_DIR / f"{name}.json"
    if REGEN or not fixture.exists():
        GOLDEN_DIR.mkdir(exist_ok=True)
        fixture.write_text(
            json.dumps(resp, ensure_ascii=False, indent=1, sort_keys=True),
            encoding="utf-8",
        )
        if REGEN:
            pytest.skip(f"regenerated {fixture.name}")
    golden = json.loads(fixture.read_text(encoding="utf-8"))
    problems: list = []
    _diff("$", golden, resp, problems)
    assert not problems, "\n".join(problems[:30])


def test_reference_documented_query_fields(client):  # noqa: F811
    """The exact field inventory of the reference's documented /query
    example (CLAUDE.md:76-99): candidates rows carry code/title/score/
    level/parent_code (+enhancement fields), matches carry confidence."""
    _, resp = post(client, "/query", {"text": "急性胃肠炎", "top_k": 3})
    cand = resp["candidates"][0]
    assert set(cand) == {
        "code", "title", "score", "level", "parent_code",
        "enhanced_score", "original_score", "similarity_factors",
    }
    match = resp["diagnosis_matches"][0]
    assert {
        "diagnosis_text", "candidates", "match_confidence",
        "confidence_metrics", "confidence_factors", "confidence_level",
    } <= set(match)
    assert 0.0 <= match["match_confidence"] <= 1.0
