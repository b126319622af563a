"""Semantic boundary detection — splits clinical text into diagnosis spans.

Behavioral spec (reference: services/semantic_boundary_service.py):
- Delimiter priority (:30-37): ；; (1) → 。. (2) → ，, (3) → \\n (4) → +＋ (5)
  → space/tab (6). The FIRST delimiter (in priority order) present in the
  text that yields >1 segment wins.
- Connection patterns (:39-46) suppress splits: a segment matching
  伴有并发/合并, 继发/导致/引起, 急性|慢性加重, 病史/既往史, 术后/治疗后 is
  merged back into the previous segment.
- "Semantic clustering" sets n_clusters = len(segments) — a deliberate
  no-op merge (:174-224). We keep identity grouping (and batch-encode the
  segments only where confidence needs them).
- Boundary confidence (:263-301): base 0.5 + length bonuses (>=4: +0.1,
  >=8: +0.1) + disease-term completeness (+0.2) + independence (+0.1) +
  semantic-distance bonus (+0.1 when inter-segment cosine < 0.75), cap 1.0.

TPU difference: per-segment encodes are ONE batched encoder call rather
than a Python loop of single forwards (:186-189 does one forward per
segment, plus 2 per confidence pair).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

DELIMITER_PRIORITY: Tuple[Tuple[str, int], ...] = (
    ("；", 1), (";", 1),
    ("。", 2), (".", 2),
    ("，", 3), (",", 3),
    ("\n", 4),
    ("+", 5), ("＋", 5),
    (" ", 6), ("\t", 6),
)

CONNECTION_PATTERNS = tuple(
    re.compile(p)
    for p in (
        r"伴?有?(?:并发|合并)",
        r"(?:继发|导致|引起)",
        r"(?:急性|慢性)加重",
        r"(?:病史|既往史)",
        r"(?:术后|治疗后)",
    )
)

DISEASE_TERM_RE = re.compile(r"[^，。；\s]{2,}(?:病|症|炎|癌|瘤)")
DEPENDENT_RE = re.compile(r"(?:伴有|合并|继发)")

SEMANTIC_THRESHOLD = 0.75
MIN_SEGMENT_LENGTH = 2


class SemanticBoundaryDetector:
    """Priority-delimiter segmentation with connection-aware merging."""

    def __init__(self, encoder=None):
        self.encoder = encoder  # duck-typed: needs encode_queries/encode_query
        self.semantic_threshold = SEMANTIC_THRESHOLD
        self.min_segment_length = MIN_SEGMENT_LENGTH

    # ----------------------------------------------------------- detection

    def detect_diagnosis_boundaries(self, text: str) -> List[Tuple[int, int, str]]:
        """Returns [(start, end, diagnosis_text)]."""
        if not text or not text.strip():
            return []
        segments = self._initial_segmentation(text)
        if len(segments) <= 1:
            return [(0, len(text), text.strip())]
        # semantic clustering is identity grouping (see module docstring)
        boundaries = [(s["start"], s["end"], s["text"]) for s in segments]
        return boundaries or [(0, len(text), text.strip())]

    def _initial_segmentation(self, text: str) -> List[Dict[str, Any]]:
        segments: List[Dict[str, Any]] = []
        for delimiter, priority in sorted(DELIMITER_PRIORITY, key=lambda x: x[1]):
            if delimiter not in text:
                continue
            parts = text.split(delimiter)
            if len(parts) <= 1:
                continue
            candidate: List[Dict[str, Any]] = []
            pos = 0
            for part in parts:
                part = part.strip()
                if part and len(part) >= self.min_segment_length:
                    start = text.find(part, pos)
                    end = start + len(part)
                    candidate.append(
                        {
                            "text": part,
                            "start": start,
                            "end": end,
                            "delimiter": delimiter,
                            "priority": priority,
                        }
                    )
                    pos = end
            if len(candidate) > 1:
                segments = candidate
                break
        if not segments:
            segments = [
                {
                    "text": text.strip(),
                    "start": 0,
                    "end": len(text),
                    "delimiter": None,
                    "priority": 0,
                }
            ]
        return self._merge_connection_cases(segments)

    @staticmethod
    def _merge_connection_cases(segments: List[Dict]) -> List[Dict]:
        """Segments with connection markers merge into the previous one."""
        merged: List[Dict] = []
        for seg in segments:
            connected = any(p.search(seg["text"]) for p in CONNECTION_PATTERNS)
            if connected and merged:
                prev = merged[-1]
                merged[-1] = {
                    "text": prev["text"] + " " + seg["text"],
                    "start": prev["start"],
                    "end": seg["end"],
                    "delimiter": seg["delimiter"],
                    "priority": min(prev["priority"], seg["priority"]),
                }
            else:
                merged.append(seg)
        return merged

    # ---------------------------------------------------------- confidence

    def get_boundary_confidence(
        self,
        boundaries: List[Tuple[int, int, str]],
        embeddings: Optional[np.ndarray] = None,
    ) -> List[float]:
        """``embeddings`` may carry precomputed segment embeddings (one
        row per boundary) so callers can batch the encode across many
        texts (see EnhancedTextProcessor.extract_many)."""
        texts = [b[2] for b in boundaries]
        sims: Optional[np.ndarray] = None
        if embeddings is not None and len(texts) > 1:
            embs = np.asarray(embeddings)
            sims = np.sum(embs[:-1] * embs[1:], axis=1)
        elif self.encoder is not None and len(texts) > 1:
            try:
                embs = np.asarray(self.encoder.encode_queries(texts))
                sims = np.sum(embs[:-1] * embs[1:], axis=1)  # consecutive cos
            except Exception:
                sims = None
        confidences = []
        for i, text in enumerate(texts):
            conf = 0.5
            if len(text) >= 4:
                conf += 0.1
            if len(text) >= 8:
                conf += 0.1
            if DISEASE_TERM_RE.search(text):
                conf += 0.2
            if not DEPENDENT_RE.search(text):
                conf += 0.1
            if sims is not None and i < len(texts) - 1:
                if float(sims[i]) < self.semantic_threshold:
                    conf += 0.1
            confidences.append(min(conf, 1.0))
        return confidences

    def analyze_text_structure(self, text: str) -> Dict[str, Any]:
        boundaries = self.detect_diagnosis_boundaries(text)
        confidences = self.get_boundary_confidence(boundaries)
        return {
            "original_text": text,
            "total_boundaries": len(boundaries),
            "boundaries": [
                {
                    "text": b[2],
                    "start": b[0],
                    "end": b[1],
                    "confidence": c,
                    "length": len(b[2]),
                }
                for b, c in zip(boundaries, confidences)
            ],
            "avg_confidence": float(np.mean(confidences)) if confidences else 0.0,
            "is_multi_diagnosis": len(boundaries) > 1,
        }
