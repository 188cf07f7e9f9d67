"""Stage-B scoring: rubric-wise scores, flags, sink-record assembly.

The reference's Stage B is a remote LLM judging the extracted answer
against rubrics (gpt_calling ``llm_calling.py:37-89``; half-point
quantization demanded at ``gen_ai_calling.py:55``; rubric join + sums at
``utils.py:205-221``; flags + sink record at ``utils.py:94-125``).  The
engine replaces the LLM with a deterministic token-overlap scorer and
keeps every surrounding semantic identical:

- per-rubric score = overlap(answer, criteria) × rubric.score, quantized
  to multiples of 0.5;
- positional rubric join via assign_rubric_id_to_response (J1 + A1);
- blank answers short-circuit with score 0 / "No answer provided"
  (gen_ai_calling.py:298-299,319-320 — M19);
- flags via derive_is_correct / derive_is_blank (M18, quirks preserved);
- output is the DB-update record shape (utils.py:114-125) as columns.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textfns import (
    assign_rubric_id_to_response,
    derive_is_blank,
    derive_is_correct,
)

NO_ANSWER_FEEDBACK = "No answer provided"  # gen_ai_calling.py:299,320
_WORD_SPLIT_CACHE_MAX = 4096


def _tokens(s: str) -> set[str]:
    return {w for w in s.lower().split() if w}


def quantize_half(x: float) -> float:
    """Quantize to multiples of 0.5, half-up — deterministic integer
    arithmetic (int() truncation, no banker's rounding)."""
    return int(x * 2 + 0.5) / 2


def score_one(
    answer: str,
    rubrics: list[dict] | None,
    max_score: float,
) -> dict:
    """Deterministic per-record grading → response-record dict
    (shape of llm_calling.py:75-81)."""
    if answer is None or not str(answer).strip():
        # M19 empty-page short-circuit
        return {
            "ai_feedback": NO_ANSWER_FEEDBACK,
            "score": 0.0,
            "max_score": float(max_score),
            "rubric_wise_response": [],
        }
    ans_tokens = _tokens(str(answer))
    if not rubrics:
        # no rubrics: whole-answer score against max_score (text-only path)
        return {
            "ai_feedback": f"Scored {len(ans_tokens)} answer terms.",
            "score": float(max_score) if ans_tokens else 0.0,
            "max_score": float(max_score),
            "rubric_wise_response": [],
        }

    # model-side response rows, as the LLM would emit them
    # (rubricText/rubricIndex/rubricWiseScore — gen_ai_calling.py:56-60)
    response_rows: list[dict] = []
    for i, rub in enumerate(rubrics):
        crit_tokens = _tokens(rub["criteria"])
        hit = len(ans_tokens & crit_tokens)
        overlap = hit / len(crit_tokens) if crit_tokens else 0.0
        response_rows.append(
            {
                "rubricText": rub["criteria"],
                "rubricIndex": i,
                "rubricWiseScore": quantize_half(overlap * rub["score"]),
            }
        )
    rub_in = [
        {"rubricId": r["rubric_id"], "score": r["score"], "criteria": r["criteria"]}
        for r in rubrics
    ]
    joined, score, rubric_max = assign_rubric_id_to_response(rub_in, response_rows)
    feedback = " ".join(
        f"Rubric {r['rubricId']}: {r['rubricWiseScore']}/{r['rubricWiseMaxScore']}."
        for r in joined
    )
    return {
        "ai_feedback": feedback,
        "score": float(score),
        "max_score": float(rubric_max) if rubric_max else float(max_score),
        "rubric_wise_response": [
            {
                "rubric_id": r["rubricId"],
                "rubric_wise_score": float(r["rubricWiseScore"]),
                "rubric_wise_max_score": float(r["rubricWiseMaxScore"]),
                "criteria": r["criteria"],
            }
            for r in joined
        ],
    }


def score_batch(batch: pa.Table, answer_col: str = "extracted_answer") -> pa.Table:
    """Vectorized-at-batch-level Stage B over grading requests.

    Expects columns: ``answer_col``, rubrics (list<struct>), max_score,
    student_id, scan_id, que_id.  Emits the DB-update record shape
    (utils.py:114-125) as flat columns + flags (M18)."""
    answers = batch[answer_col].to_pylist()
    rubrics = batch["rubrics"].to_pylist()
    max_scores = batch["max_score"].to_pylist()
    classes = (
        batch["engine_class"].to_pylist()
        if "engine_class" in batch.column_names
        else [""] * len(batch)
    )

    feedbacks: list[str] = []
    scores: list[float] = []
    maxes: list[float] = []
    rubric_resp: list[list[dict]] = []
    is_correct: list[bool] = []
    is_blank: list[bool] = []
    corrects = (
        batch["correct_answer"].to_pylist()
        if "correct_answer" in batch.column_names
        else [None] * len(batch)
    )
    for ans, rub, mx, cls, corr in zip(answers, rubrics, max_scores, classes, corrects):
        if cls == "extractMcq" and corr is not None and ans and str(ans).strip():
            # omr semantics (gen_ai_calling.py:114-115 prompt): just
            # correct-or-not, very brief feedback, no rubric breakdown
            mxf = float(mx if mx is not None else 1.0)
            hit = str(ans).split()[0].lower() == str(corr).lower() if str(ans).split() else False
            rec = {
                "ai_feedback": "Correct" if hit else "Incorrect",
                "score": mxf if hit else 0.0,
                "max_score": mxf,
                "rubric_wise_response": [],
            }
        elif cls == "essayExtract" and ans and str(ans).strip():
            # A4 + M14: 3-call concat → essay fold, fixed maxScore 15
            from ..functions.essay import essay_grade

            fb, sc, emx = essay_grade(str(ans))
            rec = {
                "ai_feedback": fb,
                "score": sc,
                "max_score": emx,
                "rubric_wise_response": [],
            }
        else:
            rec = score_one(ans, rub, mx if mx is not None else 1.0)
        feedbacks.append(rec["ai_feedback"])
        scores.append(rec["score"])
        maxes.append(rec["max_score"])
        rubric_resp.append(rec["rubric_wise_response"])
        is_correct.append(derive_is_correct(rec["score"], rec["max_score"]))
        is_blank.append(derive_is_blank(ans if ans is not None else ""))

    from ..schema import RUBRIC_RESPONSE_TYPE

    return pa.table(
        {
            "student_id": batch["student_id"],
            "scan_id": batch["scan_id"],
            "que_id": batch["que_id"],
            "ai_feedback": pa.array(feedbacks, type=pa.string()),
            "score": pa.array(scores, type=pa.float64()),
            "max_score": pa.array(maxes, type=pa.float64()),
            "student_answer": pa.array(
                [a if a is not None else "" for a in answers], type=pa.large_string()
            ),
            "is_correct": pa.array(is_correct),
            "is_blank": pa.array(is_blank),
            "rubric_wise_response": pa.array(rubric_resp, type=RUBRIC_RESPONSE_TYPE),
            "status": pa.array(["processed"] * len(batch), type=pa.string()),
        }
    )
