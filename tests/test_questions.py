"""/generateQuestion pipeline: generation, M23 format conversion, credit
reduction (SURVEY.md §3.2)."""

import pyarrow as pa
import pytest
import ray.data as rd

from ai_service_ocr_grading_handler_ray.pipelines.questions import (
    convert_question_format,
    credit_reducer,
    generate_questions,
    question_generation_batch,
)

INPUT = {
    "gradeLevel": 7,
    "subject": "Mathematics",
    "educationBoard": "CBSE",
    "topic": "fractions",
    "numberOfQuestions": 4,
}


def test_generation_deterministic_and_validated():
    a, b = generate_questions(INPUT), generate_questions(INPUT)
    assert a == b
    assert len(a["questions"]) == 4
    assert {q["questionType"] for q in a["questions"]} == {"mcq", "openEnded"}
    with pytest.raises(ValueError):
        generate_questions({**INPUT, "numberOfQuestions": 1})
    with pytest.raises(ValueError):
        generate_questions({**INPUT, "topic": None})


def test_convert_mcq_branch():
    q = {
        "question": "What is `1/2` + `1/2`?",
        "marks": 1,
        "answer": "opt2",
        "questionType": "mcq",
        "subject": "mathematics",
        "rubrics": [],
        "options": [{"opt1": "1", "opt2": "2", "opt3": "3", "opt4": "4"}],
    }
    rec = convert_question_format([q])[0]
    assert rec["contentSubType"] == "multipleChoice"
    assert rec["contentSubSubType"] == "tickmark"
    assert rec["markupFormat"] == "asciiMath"  # STEM + backtick
    assert rec["lines"] == 2  # marks=1 → 2 lines
    assert [o["value"] for o in rec["options"]] == ["1", "2", "3", "4"]
    assert all(o["correctOption"] == "1" for o in rec["options"])  # opt2 → index 1
    assert rec["ans"] == "opt2"


def test_convert_mcq_answer_by_value():
    q = {
        "question": "Pick `one`",
        "marks": 2,
        "answer": "beta",
        "questionType": "multiple choice",
        "subject": "english",
        "rubrics": [],
        "options": [{"opt1": "alpha", "opt2": "beta", "opt3": "gamma", "opt4": "delta"}],
    }
    rec = convert_question_format([q])[0]
    # non-STEM: backticks become quotes, markup text
    assert rec["questionText"] == "Pick 'one'"
    assert rec["markupFormat"] == "text"
    assert all(o["correctOption"] == "1" for o in rec["options"])


def test_convert_mcq_no_match_fixed_zero():
    # reference leaves correct_option_index unbound here (NameError); we fix as 0
    q = {
        "question": "Q",
        "marks": 1,
        "answer": "nonexistent",
        "questionType": "mcq",
        "subject": "english",
        "rubrics": [],
        "options": [{"opt1": "a", "opt2": "b", "opt3": "c", "opt4": "d"}],
    }
    rec = convert_question_format([q])[0]
    assert all(o["correctOption"] == "0" for o in rec["options"])


def test_convert_open_ended_rubrics():
    q = {
        "question": "Explain photosynthesis",
        "marks": 3,
        "answer": "Plants make food",
        "questionType": "openEnded",
        "subject": "biology",
        "rubrics": [{"rubricText": "mentions light", "marks": 1}, {"rubricText": "mentions CO2", "marks": 2}],
        "options": [],
    }
    rec = convert_question_format([q])[0]
    assert rec["contentSubType"] == "openEnded"
    assert rec["lines"] == 7  # marks=3 → 7
    assert rec["rubrics"] == [
        {"score": 1, "criteria": "mentions light", "rubricId": rec["rubrics"][0]["rubricId"]},
        {"score": 2, "criteria": "mentions CO2", "rubricId": rec["rubrics"][1]["rubricId"]},
    ]
    assert rec["ans"] == ["Plants make food"]


def test_ids_deterministic_but_unique():
    qs = generate_questions(INPUT)
    a = convert_question_format(qs, id_seed="s1")
    b = convert_question_format(qs, id_seed="s1")
    c = convert_question_format(qs, id_seed="s2")
    assert [r["questionId"] for r in a] == [r["questionId"] for r in b]
    assert a[0]["questionId"] != c[0]["questionId"]
    ids = [r["questionId"] for r in a] + [r["answerBoxId"] for r in a]
    assert len(set(ids)) == len(ids)


def test_pipeline_and_credit_reducer():
    reqs = rd.from_arrow(
        pa.table(
            {
                "user_id": ["u1", "u2"],
                "grade_level": [7, 9],
                "subject": ["Mathematics", "English"],
                "board": ["CBSE", "ICSE"],
                "topic": ["fractions", "poetry"],
                "n_questions": [4, 6],
            }
        )
    )
    generated = reqs.map_batches(question_generation_batch, batch_format="pyarrow")
    users = rd.from_arrow(
        pa.table({"user_id": ["u1", "u2", "u3"], "credits": [10.0, 5.0, 1.0]})
    )
    out = credit_reducer(generated, users).sort_values("user_id")
    assert out["credits"].tolist() == [10.0 - 0.4, 5.0 - 0.6, 1.0]
    assert out["n_generated"].tolist() == [4, 6, 0]
