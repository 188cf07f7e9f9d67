"""Group-compose + number-prediction operators (SURVEY.md A5/A6, J5, M24).

The reference's ``NumberOCR`` downloads N answer-crop images per request,
composes them into one stacked canvas (``llm_number_prediction.py:83-99``:
5px border, 10px gaps, white canvas ``max(width)+2b × Σheights``), sends
one vision call, then positionally matches predicted numbers back to crops
with a count assertion (``:125-126``) and scores by equality against
``correctAnswer`` (``:191-192`` — where the reference leaves ``score``
unbound on inequality; fixed here as 0.0, SURVEY.md J5).

Engine mapping: ``groupby(scan_id).map_groups(compose)`` — per-group
reduce over binary payloads; the stacked geometry is mirrored with
integer arithmetic over the synthetic image format.
"""

from __future__ import annotations

import re

import pandas as pd

from ..payloads import decode_image_text, encode_image_text

BORDER = 5  # px, llm_number_prediction.py:86
GAP = 10  # px, llm_number_prediction.py:87
CHAR_W = 6
CHAR_H = 10

_FIRST_INT = re.compile(r"\d+")


def image_dims(text: str) -> tuple[int, int]:
    """Synthetic image geometry: width = longest line × CHAR_W, height =
    n_lines × CHAR_H (deterministic integer stand-in for cv2 shape)."""
    lines = text.split("\n") or [""]
    return max((len(ln) for ln in lines), default=0) * CHAR_W, len(lines) * CHAR_H


def compose_stacked_image(payloads: list[bytes]) -> tuple[bytes, int, int]:
    """A5: vertical stack → (stacked_payload, canvas_w, canvas_h).

    Geometry mirrors _create_stacked_image: canvas width = max(width) +
    2·border; height = Σheights + gaps between crops + 2·border."""
    texts = [decode_image_text(p) for p in payloads]
    dims = [image_dims(t) for t in texts]
    canvas_w = (max((w for w, _ in dims), default=0)) + 2 * BORDER
    canvas_h = sum(h for _, h in dims) + GAP * max(0, len(dims) - 1) + 2 * BORDER
    stacked = encode_image_text("\n\n".join(texts))
    return stacked, canvas_w, canvas_h


def number_list_flatten(nested: list) -> list[int]:
    """M24 (llm_number_prediction.py:31-37): flatten list-of-lists to ints,
    dropping falsy entries (0 included — reference semantics)."""
    out: list[int] = []
    for sub in nested:
        items = sub if isinstance(sub, list) else [sub]
        for v in items:
            if v:
                out.append(int(v))
    return out


def predict_number(text: str) -> int:
    """Deterministic number 'prediction': first integer in the crop text,
    else 0 (stand-in for the gemini number call)."""
    m = _FIRST_INT.search(text)
    return int(m.group(0)) if m else 0


def predict_numbers_for_group(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn over (scan_id, que_id, student_answer_payload,
    correct_answer, max_score): compose → predict → count-check (A6) →
    equality score (J5, unbound-branch fixed as 0)."""
    payloads = list(g["student_answer_payload"])
    stacked, w, h = compose_stacked_image(payloads)
    texts = decode_image_text(stacked).split("\n\n")
    numbers = [predict_number(t) for t in texts]
    if len(numbers) != len(payloads):  # A6 invariant, llm_number_prediction.py:125
        raise ValueError("predicted number count does not match image count")
    out = g.copy()
    out["predicted_number"] = numbers
    correct = pd.to_numeric(out["correct_answer"], errors="coerce")
    out["score"] = [
        float(m) if c == p else 0.0
        for m, c, p in zip(out["max_score"], correct, numbers)
    ]
    out["canvas_w"] = w
    out["canvas_h"] = h
    return out[
        ["scan_id", "que_id", "predicted_number", "score", "max_score", "canvas_w", "canvas_h"]
    ]
