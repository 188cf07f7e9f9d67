"""Essay grading path (SURVEY.md A4 + M14): the reference's
``argumentativeEssayOcr`` class makes three sequential vision calls whose
responses are concatenated, parsed as JSON feedback blocks, and folded
into (formatted_feedback, level_score) with a fixed maxScore of 15
(``gen_ai_calling.py:394-415``).

The engine's deterministic stand-in emits one JSON feedback block per
fixed feedback point per call (the reference's three prompts enumerate
the points); levels derive deterministically from the answer text, and
the downstream concat → parse → fold path is byte-identical to the
reference's ``find_data_in_string(..., type='argumentative-essay-ocr')``
flow.
"""

from __future__ import annotations

import hashlib
import json

from .textfns import extract_essay_feedback

ESSAY_MAX_SCORE = 15.0  # fixed, gen_ai_calling.py:415

# feedback points per call, from the three prompts at gen_ai_calling.py:397-409
CALL_POINTS: list[list[str]] = [
    ["Transition Words", "Spelling", "Grammar", "Legible Handwriting"],
    ["Stated Opinion", "Vocabulary Usage", "Subject Sentence", "Adverb Use"],
    ["Topic Transitions", "Conclusion Rephrasing"],
]
LEVELS = ["Effective", "Good", "Normal", "Fair", "Poor"]


def _level_for(point: str, answer: str) -> str:
    """Deterministic level: longer, wordier answers earn better levels,
    perturbed per feedback point by a stable hash."""
    n_words = len(answer.split())
    base = 0 if n_words >= 60 else 1 if n_words >= 40 else 2 if n_words >= 20 else 3
    jitter = (
        int.from_bytes(
            hashlib.blake2b(f"{point}|{answer[:64]}".encode(), digest_size=2).digest(),
            "big",
        )
        % 2
    )
    return LEVELS[min(base + jitter, len(LEVELS) - 1)]


def essay_model_response(call_idx: int, answer: str) -> str:
    """One 'model call': JSON feedback blocks for that call's points,
    wrapped in prose like a real model response."""
    blocks = [
        json.dumps(
            {
                "FeedbackPointName": p,
                "levelName": _level_for(p, answer),
                "improvement": f"Work on {p.lower()}; see the highlighted example.",
            }
        )
        for p in CALL_POINTS[call_idx]
    ]
    return "Here is the feedback: " + " ".join(blocks)


def essay_grade(answer: str) -> tuple[str, float, float]:
    """Full essay path: 3 responses concatenated → essay-mode extraction →
    (feedback, score, maxScore=15)."""
    combined = "".join(essay_model_response(i, answer) for i in range(3))
    feedback, score = extract_essay_feedback(combined)
    return feedback, float(score), ESSAY_MAX_SCORE
