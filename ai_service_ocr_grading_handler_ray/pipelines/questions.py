"""/generateQuestion pipeline (SURVEY.md §3.2): deterministic question
generation → format conversion (M23) → credit reduction (A3 + J4).

The reference's generator is an OpenAI structured-output call
(question_generation_handler.py:281-288, pydantic schema :256-278);
the engine's stand-in produces the same record shape deterministically.
``convert_question_format`` mirrors question_generation_handler.py:340-453
with documented fixes:

- ids are deterministic blake2b-derived (the reference uses random
  nanoid ``generate()`` — determinism requirement, SURVEY.md M23);
- the reference leaves ``correct_option_index`` unbound when no option
  matches the answer (NameError at :404-421) — fixed as "0";
- the ``== "Multiple Choice"`` arm (:384) is dead in the reference (the
  value was lowercased first); behavior is identical without it.

``credit_reducer`` (question_generation_handler.py:460-469) becomes a
grouped aggregate + broadcast join: credits' = credits − n_generated/10.
"""

from __future__ import annotations

import hashlib
from typing import Any

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count

from ..functions.textfns import calculate_age_range, size_getter_from_marks
from ..stages.collect import collect_tables

_STEM = {"mathematics", "science", "physics", "chemistry", "biology"}
_MCQ_NAMES = {"mcq", "multiplechoice", "multiple choice", "multiple choice question"}


def _det_id(*parts: Any) -> str:
    """Deterministic 21-char id (nanoid-shaped) from the input tuple."""
    h = hashlib.blake2b("|".join(map(str, parts)).encode(), digest_size=16).hexdigest()
    return h[:21]


def generate_questions(input_data: dict) -> dict:
    """Deterministic stand-in for the structured-output LLM call.

    Same validation as the reference (question_generation_handler.py:90-93):
    required fields present, num_questions >= 2; same output schema as the
    pydantic QuestionsResponse."""
    grade = input_data.get("gradeLevel")
    subject = input_data.get("subject")
    board = input_data.get("educationBoard")
    topic = input_data.get("topic")
    n = input_data.get("numberOfQuestions", 5)
    content_types = input_data.get("contentType", ["mcq", "openEnded"])
    if not all([grade, subject, board, topic]):
        raise ValueError("Missing required input parameters")
    if n < 2:
        raise ValueError("Number of questions must be at least 2")
    age_range = calculate_age_range(grade) if isinstance(grade, int) else "18-22"

    questions = []
    for i in range(n):
        qtype = content_types[i % len(content_types)]
        marks = 1 + i % 3
        seed = _det_id(topic, subject, grade, i)
        q_text = f"Question {i + 1} on {topic} for grade {grade} ({age_range}): explain {topic} part {seed[:4]}"
        if qtype == "mcq":
            questions.append(
                {
                    "grade": grade if isinstance(grade, int) else 0,
                    "subject": subject,
                    "topic": topic,
                    "question": q_text,
                    "questionType": "mcq",
                    "marks": marks,
                    "answer": f"opt{1 + i % 4}",
                    "rubrics": [],
                    "options": [
                        {f"opt{j}": f"{topic} choice {j} {seed[j]}" for j in range(1, 5)}
                    ],
                }
            )
        else:
            questions.append(
                {
                    "grade": grade if isinstance(grade, int) else 0,
                    "subject": subject,
                    "topic": topic,
                    "question": q_text,
                    "questionType": "openEnded",
                    "marks": marks,
                    "answer": f"A correct answer about {topic} ({seed[:6]})",
                    "rubrics": [
                        {"rubricText": f"States the key fact about {topic}", "marks": 1},
                        {"rubricText": f"Explains the reasoning for {topic}", "marks": marks - 1},
                    ][: (1 if marks == 1 else 2)],
                    "options": [],
                }
            )
    return {"questions": questions}


def convert_question_format(questions: Any, id_seed: str = "qgen") -> list[dict]:
    """M23: record-shape rewrite (question_generation_handler.py:340-453)."""
    if isinstance(questions, dict) and "questions" in questions:
        questions = questions["questions"]
    converted = []
    for idx, q in enumerate(questions):
        rec = {
            "questionText": q["question"],
            "marks": int(q["marks"]),
            "ans": [q["answer"]],
            "instructions": "",
            "showInstructions": True,
            "lineSpacing": 20,
            "lineColor": "#828282",
            "aiGrading": True,
            "lines": size_getter_from_marks(q["marks"]),
            "questionId": _det_id(id_seed, idx, "q"),
            "answerBoxId": _det_id(id_seed, idx, "a"),
            "settings": 4,
        }
        qtype = (
            q.get("Question Type") or q.get("QuestionType") or q.get("questionType") or ""
        ).lower()
        subject = q.get("subject", "english").lower()
        is_stem = subject in _STEM
        if qtype in _MCQ_NAMES:
            rec["contentSubType"] = "multipleChoice"
            rec["contentSubSubType"] = "tickmark"
            if is_stem:
                rec["markupFormat"] = "asciiMath" if "`" in q["question"] else "text"
            else:
                rec["questionText"] = q["question"].replace("`", "'")
                rec["markupFormat"] = "text"
            correct = 0  # reference leaves this unbound on no match; fixed as 0
            for j, (key, value) in enumerate(q["options"][0].items()):
                if value == q["answer"] or key == q["answer"]:
                    correct = j
            rec["options"] = [
                {"value": value, "correctOption": str(correct), "optionId": _det_id(id_seed, idx, "o", j)}
                for j, (key, value) in enumerate(q["options"][0].items())
            ]
            rec["rubrics"] = q["rubrics"]
            rec["ans"] = q["answer"]
        else:
            if is_stem:
                rec["markupFormat"] = "asciiMath" if "`" in q["question"] else "text"
            else:
                rec["questionText"] = q["question"].replace("`", "'")
                rec["markupFormat"] = "text"
            rec["rubrics"] = [
                {"score": r["marks"], "criteria": r["rubricText"], "rubricId": _det_id(id_seed, idx, "r", j)}
                for j, r in enumerate(q["rubrics"])
            ]
            rec["contentSubType"] = "openEnded"
            rec["contentSubSubType"] = "shortAnswer"
        converted.append(rec)
    return converted


def question_generation_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: one input row (user_id, gradeLevel, subject,
    educationBoard, topic, n) → n converted question rows."""
    out_user: list[str] = []
    out_qid: list[str] = []
    out_text: list[str] = []
    out_marks: list[int] = []
    out_subtype: list[str] = []
    out_markup: list[str] = []
    for i in range(len(batch)):
        row = {c: batch[c][i].as_py() for c in batch.column_names}
        gen = generate_questions(
            {
                "gradeLevel": row["grade_level"],
                "subject": row["subject"],
                "educationBoard": row["board"],
                "topic": row["topic"],
                "numberOfQuestions": row["n_questions"],
            }
        )
        conv = convert_question_format(gen, id_seed=f"{row['user_id']}-{row['topic']}")
        for rec in conv:
            out_user.append(row["user_id"])
            out_qid.append(rec["questionId"])
            out_text.append(rec["questionText"])
            out_marks.append(rec["marks"])
            out_subtype.append(rec["contentSubType"])
            out_markup.append(rec["markupFormat"])
    return pa.table(
        {
            "user_id": pa.array(out_user, type=pa.string()),
            "question_id": pa.array(out_qid, type=pa.string()),
            "question_text": pa.array(out_text, type=pa.string()),
            "marks": pa.array(out_marks, type=pa.int64()),
            "content_sub_type": pa.array(out_subtype, type=pa.string()),
            "markup_format": pa.array(out_markup, type=pa.string()),
        }
    )


def credit_reducer(
    generated: rd.Dataset, users: rd.Dataset, user_key: str = "user_id"
) -> pd.DataFrame:
    """A3 + J4: credits' = credits − n_generated/10, as a grouped aggregate
    joined against the (broadcast) users side table."""
    counts = generated.groupby(user_key).aggregate(Count(alias_name="n_generated"))
    users_tbl = pa.concat_tables(collect_tables(users, drop_empty=False))
    users_df = users_tbl.to_pandas()
    counts_df = counts.to_pandas()
    out = users_df.merge(counts_df, on=user_key, how="left")
    out["n_generated"] = out["n_generated"].fillna(0).astype("int64")
    out["credits"] = out["credits"] - out["n_generated"] / 10.0
    return out
