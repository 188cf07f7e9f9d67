"""Message-IR format conversions (SURVEY.md M1, M5-M8, M11) — the
reference's provider wire formats as pure record-shape transforms.

In the engine these are per-row projections used inside ``map_batches``
(the "provider" is a deterministic local scorer, but the IR shapes are
preserved for parity).  Semantics cloned from observable behavior at
``llm_format_convertion.py``; quirks preserved:

- ``convert_gpt_to_gemini`` is defined TWICE in the reference
  (llm_format_convertion.py:35-51 and :88-106); only the second
  definition is live (module-level shadowing).  This module implements
  the live one.
- user turns are concatenated with a trailing comma separator exactly as
  the reference does (``+","``).
"""

from __future__ import annotations

from typing import Any

# -- M1: normal-message builder (message_object_creator, gen_ai_calling.py:33-126)


def build_normal_message(
    rubrics: Any,
    question: str | None,
    student_answer: str | None,
    max_score: float,
    system_instruction: str = "",
    scoring_criteria: str = "",
    model_class: str = "",
    answer_url: str = "",
) -> dict:
    """Prompt-assembly projection.  Branching mirrors gen_ai_calling.py:
    - gptOCR → degenerate 2-field form {systemPrompt, answer} (:107)
    - wholePageOcr → system only, no maxScore concat (:111)
    - gptVisionOCR/gptVisionMCQ → system + criteria (:105)
    - else → system + str(maxScore) + criteria (:113)
    None question/answer coalesce to "" (:119-122)."""
    from .textfns import convert_rubric_to_string

    if model_class == "gptOCR":
        return {
            "systemPrompt": system_instruction + scoring_criteria,
            "answer": student_answer,
        }
    if model_class in ("gptVisionOCR", "gptVisionMCQ"):
        system_final = system_instruction + scoring_criteria
    elif model_class == "wholePageOcr":
        system_final = system_instruction
    else:
        system_final = system_instruction + str(max_score) + scoring_criteria
    return {
        "systemPrompt": system_final,
        "rubric": convert_rubric_to_string(rubrics) if rubrics is not None else None,
        "question": question if question is not None else "",
        "answer": student_answer if student_answer is not None else "",
        "answerUrl": answer_url,
        "rubricJson": rubrics,
    }


# -- M5: convert_normal_to_gpt (llm_format_convertion.py:5-34) ---------------


def convert_normal_to_gpt(message: dict) -> list[dict]:
    """3 system turns (prompt, rubric, "question: …") + 1 user turn
    ("studentAnswer: …"), with empty answer → the literal "No Answer"."""
    out: list[dict] = []
    if "systemPrompt" in message:
        out.append({"role": "system", "content": message["systemPrompt"]})
    if "rubric" in message:
        out.append({"role": "system", "content": message["rubric"]})
    if "question" in message:
        out.append({"role": "system", "content": "question: " + message["question"]})
    if "studentAnswer" in message or "answer" in message:
        ans = str(message["answer"])
        out.append(
            {
                "role": "user",
                "content": ("studentAnswer: " + ans) if ans != "" else "No Answer",
            }
        )
    return out


# -- M6: convert_gpt_to_claude (llm_format_convertion.py:52-70) --------------


def convert_gpt_to_claude(gpt_data: list[dict]) -> dict:
    system = ""
    combined = ""
    for m in gpt_data:
        if m["role"] == "system":
            system += m["content"].strip() + "\n\n"
        elif m["role"] == "user":
            combined += m["content"] + ","
    return {
        "system": system.strip(),
        "messages": [{"role": "user", "content": [{"text": combined, "type": "text"}]}],
    }


# -- M7: convert_gpt_to_gemini — LIVE (second) def (llm_format_convertion.py:88-106)


def convert_gpt_to_gemini(gpt_data: list[dict]) -> dict:
    system = ""
    combined = ""
    for m in gpt_data:
        if m["role"] == "system":
            system += m["content"].strip() + "\n\n"
        elif m["role"] == "user":
            combined += m["content"] + ","
    return {
        "system": system.strip(),
        "messages": [{"role": "user", "parts": [combined]}],
    }


# -- M8: convert_gpt_to_llamma (llm_format_convertion.py:72-86) --------------


def convert_gpt_to_llamma(gpt_data: list[dict]) -> dict:
    system = ""
    combined = ""
    for m in gpt_data:
        if m["role"] == "system":
            system += m["content"].strip() + "\n\n"
        elif m["role"] == "user":
            combined += m["content"] + ","
    return {"system": system.strip(), "prompt": combined}


# -- M11: convert_normal_to_gemini_number (llm_format_convertion.py:188-193) -


def convert_normal_to_gemini_number(message: dict) -> dict:
    return {
        "base64_image": message["encoded_image_base64"],
        "batch_size": message["batch_size"],
    }
