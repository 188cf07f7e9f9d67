"""Scalar function library — reference semantics, reimplemented from scratch.

Each function mirrors one operator from SURVEY.md §2.2/§2.4/§2.5 with the
reference's *exact* observable behavior, including documented quirks
(SURVEY.md §7.4 "reference quirk preservation").  Citations are to
/root/reference file:line; no code is copied — these are clean-room
reimplementations of the described input→output behavior.

Used per-row inside vectorized ``map_batches`` stages; pure and
deterministic so golden digests are stable.
"""

from __future__ import annotations

import json
import re
from typing import Any

# -- M12/M13/M14: find_data_in_string (utils.py:167-203) ---------------------

_QUOTE_EDGES = re.compile(r'^"+|"+$')
_OCR_KV = re.compile(r"(?i)ocr:\s*['\"](.*?)['\"]")
_OCR_JSON = re.compile(r"(?i)\{\s*['\"]ocr['\"]\s*:\s*['\"](.*?)['\"]\s*\}")
_FIRST_BRACE = re.compile(r"\{.*?\}", re.DOTALL)


def extract_ocr_field(data_string: str) -> str:
    """Mode "ocr" (utils.py:168-182): strip wrapping double quotes, find
    ``ocr:"…"`` / ``{"ocr": "…"}`` values (kv matches win over json
    matches), fall back to the cleaned string."""
    cleaned = _QUOTE_EDGES.sub("", data_string)
    matches = _OCR_KV.findall(cleaned) + _OCR_JSON.findall(cleaned)
    return matches[0] if matches else cleaned


def extract_first_json_block(data_string: str) -> str:
    """Mode "claude-json" (utils.py:183-189): first non-greedy ``{…}``
    (DOTALL) or the input unchanged."""
    m = _FIRST_BRACE.search(data_string)
    return m.group(0) if m is not None else data_string


def extract_essay_feedback(data_string: str) -> tuple[str, float]:
    """Mode "argumentative-essay-ocr" (utils.py:190-203): findall ``{…}``
    blocks → parse each as JSON → feedback-format fold.  Raises on invalid
    JSON, exactly like the reference (callers apply the poison-pill
    policy)."""
    objs = [json.loads(m) for m in _FIRST_BRACE.findall(data_string)]
    return convert_feedback_format(json.dumps(objs))


# -- A2: convert_feedback_format (utils.py:146-162) --------------------------

_LEVEL_FULL = frozenset({"Effective", "Good", "Satisfactory"})
_LEVEL_HALF = frozenset({"Normal", "Fair"})


def convert_feedback_format(feedback_json: str) -> tuple[str, float]:
    """Per-record fold: concatenate ``"{FeedbackPointName} - {improvement}"``
    lines; level→score: Effective/Good/Satisfactory→+1, Normal/Fair→+0.5,
    else +0 (case-sensitive exact match, as in the reference)."""
    feedback_list = json.loads(feedback_json)
    parts: list[str] = []
    score = 0.0
    for fb in feedback_list:
        parts.append(f"{fb['FeedbackPointName']} - {fb['improvement']}\n\n")
        level = fb["levelName"]
        if level is not None:
            if level in _LEVEL_FULL:
                score += 1
            elif level in _LEVEL_HALF:
                score += 0.5
    return "".join(parts).strip(), score


# -- M15: convert_rubric_to_string (utils.py:132-140) ------------------------

def convert_rubric_to_string(rubrics: Any) -> Any:
    """list-of-struct → ``"Rubrics: {score} Points: {criteria}, …"`` with the
    reference's trailing ``", "``; non-list passes through unchanged."""
    if not isinstance(rubrics, list):
        return rubrics
    out = "Rubrics: "
    for r in rubrics:
        out += f"{r['score']} Points: {r['criteria']}, "
    return out


# -- M17: field_exist_or_not (utils.py:16-21) --------------------------------

def coalesce_field(response: dict, field: str, default: Any) -> Any:
    """Present-and-non-empty-string wins, else default (''-only emptiness —
    0 / [] / None present in the dict are returned as-is, matching the
    reference's ``!=""`` check)."""
    if field in response:
        val = response[field]
        return val if val != "" else default
    return default


# -- M18: flag derivation (utils.py:94-111) — quirks preserved ---------------

def derive_is_correct(score: Any, max_score: Any) -> bool:
    """True iff score == maxScore; every other branch is False
    (utils.py:96-102 — both elif/else collapse to False)."""
    return score == max_score


def derive_is_blank(ocr: Any) -> bool:
    """Reference quirk (utils.py:103-111): for ints, always False (the
    ``ocr==''`` comparison can't be true); for strings, True only for
    ``''`` — the ``.lower()=='Empty Response'`` arm compares a lowercased
    value to a capitalized literal and never fires."""
    if isinstance(ocr, int):
        return ocr == ""  # always False — preserved verbatim semantics
    return ocr == "" or ocr.lower() == "Empty Response"


# -- J1 + A1: assign_rubric_id_to_response (utils.py:205-221) ----------------

def assign_rubric_id_to_response(
    rubric_json: Any, response_json: list[dict]
) -> tuple[list[dict], float, float]:
    """Positional (index) join of request-side rubrics with model-side
    rubric responses: copy rubricId/rubricWiseMaxScore/criteria in, drop
    rubricIndex/rubricText, accumulate score and max_score sums.  Non-list
    rubrics → unchanged response with (0, 0) sums."""
    max_score = 0.0
    score = 0.0
    if not isinstance(rubric_json, list):
        return response_json, score, max_score
    for i, rub in enumerate(rubric_json):
        resp = response_json[i]
        resp["rubricId"] = rub["rubricId"]
        resp["rubricWiseMaxScore"] = rub["score"]
        resp["criteria"] = rub["criteria"]
        # reference uses bare `del` (utils.py:213-214): a response row
        # missing these keys raises KeyError — preserved verbatim
        del resp["rubricIndex"]
        del resp["rubricText"]
        score += resp["rubricWiseScore"]
        max_score += rub["score"]
    return response_json, score, max_score


# -- M3/M4: broadcast lookups (utils.py:141-145, utils.py:23-29) -------------

MODEL_NOT_FOUND = "model does not found"  # exact miss sentinel, utils.py:145
DEFAULT_PROMPT_FALLBACK = (
    "You will read the handwritting in the given image, write what you read "
    "in the image as it is, "
)  # exact default, utils.py:29


def mapping_model_with_name(model_name: str, mapping: dict) -> Any:
    """Alias → descriptor lookup; miss returns the reference's sentinel
    string (not None / raise)."""
    return mapping.get(model_name, MODEL_NOT_FOUND)


def get_prompt(task: str, subject_name: str, prompts: list[dict]) -> str:
    """(task, lower(subjectName)) lookup with the reference's default
    fallback prompt on miss (case-insensitive subject match, utils.py:26)."""
    for p in prompts:
        if p["task"] == task and p["subjectName"].lower() == subject_name.lower():
            return p["promptText"]
    return DEFAULT_PROMPT_FALLBACK


# -- M16: regex unescape (gen_ai_calling.py:203,214) -------------------------

def unescape_double_backslash(prompt: str) -> str:
    return re.sub(r"\\\\", r"\\", prompt)


# -- M20/M21/M22 (question_generation_handler.py:24-57,326-337) --------------

_FIRST_INT = re.compile(r"\d+")


def extract_grade_number(grade: str) -> int | None:
    """First integer in a grade string (qgh.py:24-42)."""
    m = _FIRST_INT.search(str(grade))
    return int(m.group(0)) if m else None


def calculate_age_range(grade: int) -> str:
    """grade+5 .. grade+8 (qgh.py:44-57)."""
    return f"{grade + 5}-{grade + 8}"


def size_getter_from_marks(marks: int) -> int:
    """marks → answer line-count bucket {1→2, 2→5, 3→7, else 10}
    (qgh.py:326-337)."""
    return {1: 2, 2: 5, 3: 7}.get(marks, 10)
