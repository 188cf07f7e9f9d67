"""Provider wire-format conversions (SURVEY.md M1, M5-M8, M11)."""

from ai_service_ocr_grading_handler_ray.functions.formats import (
    build_normal_message,
    convert_gpt_to_claude,
    convert_gpt_to_gemini,
    convert_gpt_to_llamma,
    convert_normal_to_gemini_number,
    convert_normal_to_gpt,
)

NORMAL = {
    "systemPrompt": "  grade this  ",
    "rubric": "Rubrics: 2.0 Points: thesis, ",
    "question": "What is X?",
    "answer": "X is Y",
}


def test_normal_to_gpt_shape():
    out = convert_normal_to_gpt(NORMAL)
    assert [m["role"] for m in out] == ["system", "system", "system", "user"]
    assert out[2]["content"] == "question: What is X?"
    assert out[3]["content"] == "studentAnswer: X is Y"


def test_empty_answer_sentinel():
    out = convert_normal_to_gpt({**NORMAL, "answer": ""})
    assert out[3]["content"] == "No Answer"


def test_gpt_to_claude_folds_system_and_comma_joins_user():
    gpt = convert_normal_to_gpt(NORMAL)
    out = convert_gpt_to_claude(gpt)
    assert out["system"].startswith("grade this")  # stripped
    assert "question: What is X?" in out["system"]
    assert out["messages"] == [
        {"role": "user", "content": [{"text": "studentAnswer: X is Y,", "type": "text"}]}
    ]


def test_gpt_to_gemini_live_definition():
    # the live (second) def: {system, messages:[{role,parts:[str]}]}
    out = convert_gpt_to_gemini(convert_normal_to_gpt(NORMAL))
    assert set(out) == {"system", "messages"}
    assert out["messages"] == [{"role": "user", "parts": ["studentAnswer: X is Y,"]}]


def test_gpt_to_llamma():
    out = convert_gpt_to_llamma(convert_normal_to_gpt(NORMAL))
    assert set(out) == {"system", "prompt"}
    assert out["prompt"] == "studentAnswer: X is Y,"


def test_gemini_number_rename():
    out = convert_normal_to_gemini_number(
        {"encoded_image_base64": "abc", "batch_size": 4}
    )
    assert out == {"base64_image": "abc", "batch_size": 4}


def test_build_normal_message_branches():
    rub = [{"rubricId": "r", "score": 1.0, "criteria": "c"}]
    # gptOCR degenerate 2-field form (gen_ai_calling.py:107)
    m = build_normal_message(rub, "q", "a", 5.0, "S", "C", model_class="gptOCR")
    assert set(m) == {"systemPrompt", "answer"} and m["systemPrompt"] == "SC"
    # wholePageOcr: system only
    m = build_normal_message(rub, "q", "a", 5.0, "S", "C", model_class="wholePageOcr")
    assert m["systemPrompt"] == "S"
    # default: system + str(maxScore) + criteria
    m = build_normal_message(rub, None, None, 5.0, "S", "C", model_class="gptText")
    assert m["systemPrompt"] == "S5.0C"
    assert m["question"] == "" and m["answer"] == ""
    assert m["rubric"].startswith("Rubrics: ")
