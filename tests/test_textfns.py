"""Reference-semantics function library, incl. preserved quirks
(FIXTURES.md §5 fixture strings; SURVEY.md M12-M18, J1, A1-A2)."""

import json

import pytest

from ai_service_ocr_grading_handler_ray.functions.textfns import (
    DEFAULT_PROMPT_FALLBACK,
    MODEL_NOT_FOUND,
    assign_rubric_id_to_response,
    calculate_age_range,
    coalesce_field,
    convert_feedback_format,
    convert_rubric_to_string,
    derive_is_blank,
    derive_is_correct,
    extract_essay_feedback,
    extract_first_json_block,
    extract_grade_number,
    extract_ocr_field,
    get_prompt,
    mapping_model_with_name,
    size_getter_from_marks,
    unescape_double_backslash,
)


class TestExtractOcrField:
    def test_kv_form(self):
        assert extract_ocr_field('result ocr:"the student wrote this" end') == "the student wrote this"

    def test_bare_kv_quote_strip_quirk(self):
        # utils.py:170: wrapping-quote strip runs BEFORE matching, so a bare
        # ocr:"value" loses its closing quote and falls through unmatched
        assert extract_ocr_field('ocr:"the student wrote this"') == 'ocr:"the student wrote this'

    def test_kv_single_quotes(self):
        assert extract_ocr_field("OCR: 'case insensitive'") == "case insensitive"

    def test_json_form(self):
        assert extract_ocr_field('{"ocr": "json value"}') == "json value"

    def test_kv_wins_over_json(self):
        s = 'prefix ocr:"kv" and {"ocr": "json"}'
        assert extract_ocr_field(s) == "kv"

    def test_fallback_strips_wrapping_quotes(self):
        assert extract_ocr_field('""plain text answer""') == "plain text answer"

    def test_fallback_passthrough(self):
        assert extract_ocr_field("no pattern here") == "no pattern here"


class TestExtractFirstJsonBlock:
    def test_first_block(self):
        assert extract_first_json_block('junk {"a": 1} {"b": 2}') == '{"a": 1}'

    def test_dotall(self):
        assert extract_first_json_block('x {\n"a":\n1\n} y') == '{\n"a":\n1\n}'

    def test_no_block_passthrough(self):
        assert extract_first_json_block("nothing") == "nothing"


class TestFeedbackFold:
    FIXTURE = json.dumps(
        [
            {"FeedbackPointName": "Thesis", "improvement": "sharpen it", "levelName": "Effective"},
            {"FeedbackPointName": "Evidence", "improvement": "add cites", "levelName": "Fair"},
            {"FeedbackPointName": "Style", "improvement": "vary syntax", "levelName": "Weak"},
            {"FeedbackPointName": "Flow", "improvement": "transitions", "levelName": None},
        ]
    )

    def test_level_scoring(self):
        text, score = convert_feedback_format(self.FIXTURE)
        assert score == 1.5  # Effective=1 + Fair=0.5 + Weak=0 + None skipped
        assert text.startswith("Thesis - sharpen it")
        assert text.endswith("Flow - transitions")  # stripped

    def test_case_sensitive_levels(self):
        _, score = convert_feedback_format(
            json.dumps([{"FeedbackPointName": "x", "improvement": "y", "levelName": "good"}])
        )
        assert score == 0  # 'good' != 'Good' — exact-case match only

    def test_essay_mode_combines_blocks(self):
        s = (
            '{"FeedbackPointName": "A", "improvement": "a", "levelName": "Good"} noise '
            '{"FeedbackPointName": "B", "improvement": "b", "levelName": "Normal"}'
        )
        text, score = extract_essay_feedback(s)
        assert score == 1.5
        assert "A - a" in text and "B - b" in text

    def test_essay_mode_invalid_json_raises(self):
        with pytest.raises(json.JSONDecodeError):
            extract_essay_feedback("{not json}")


class TestRubricString:
    def test_format_with_trailing_comma(self):
        s = convert_rubric_to_string(
            [{"score": 2.0, "criteria": "states thesis"}, {"score": 1.0, "criteria": "cites"}]
        )
        assert s == "Rubrics: 2.0 Points: states thesis, 1.0 Points: cites, "

    def test_non_list_passthrough(self):
        assert convert_rubric_to_string("already a string") == "already a string"


class TestCoalesce:
    def test_present(self):
        assert coalesce_field({"ocr": "x"}, "ocr", "d") == "x"

    def test_empty_string_falls_back(self):
        assert coalesce_field({"ocr": ""}, "ocr", "d") == "d"

    def test_missing_falls_back(self):
        assert coalesce_field({}, "ocr", "d") == "d"

    def test_zero_is_kept(self):
        assert coalesce_field({"score": 0}, "score", 99) == 0


class TestFlags:
    def test_correct_iff_equal(self):
        assert derive_is_correct(5.0, 5.0) is True
        assert derive_is_correct(2.5, 5.0) is False
        assert derive_is_correct(0, 5.0) is False

    def test_blank_quirk(self):
        # utils.py:108: lowercased value vs capitalized literal never matches
        assert derive_is_blank("") is True
        assert derive_is_blank("Empty Response") is False  # the quirk
        assert derive_is_blank("empty response") is False
        assert derive_is_blank("real answer") is False

    def test_blank_int_branch(self):
        assert derive_is_blank(0) is False  # int=='' is always False


class TestRubricJoin:
    def test_positional_join_and_sums(self):
        rubrics = [
            {"rubricId": "r1", "score": 2.0, "criteria": "c1"},
            {"rubricId": "r2", "score": 3.0, "criteria": "c2"},
        ]
        resp = [
            {"rubricText": "c1", "rubricIndex": 0, "rubricWiseScore": 1.5},
            {"rubricText": "c2", "rubricIndex": 1, "rubricWiseScore": 3.0},
        ]
        joined, score, max_score = assign_rubric_id_to_response(rubrics, resp)
        assert score == 4.5
        assert max_score == 5.0
        assert joined[0] == {"rubricId": "r1", "rubricWiseMaxScore": 2.0, "criteria": "c1", "rubricWiseScore": 1.5}
        assert "rubricIndex" not in joined[1] and "rubricText" not in joined[1]

    def test_non_list_rubrics(self):
        resp = [{"rubricWiseScore": 1}]
        assert assign_rubric_id_to_response(None, resp) == (resp, 0, 0)


class TestLookups:
    def test_model_mapping_miss_sentinel(self):
        assert mapping_model_with_name("nope", {"a": 1}) == MODEL_NOT_FOUND
        assert mapping_model_with_name("a", {"a": 1}) == 1

    def test_prompt_lookup_case_insensitive(self):
        table = [{"task": "ocr", "subjectName": "Mathematics", "promptText": "P"}]
        assert get_prompt("ocr", "mathematics", table) == "P"
        assert get_prompt("ocr", "MATHEMATICS", table) == "P"
        assert get_prompt("other", "mathematics", table) == DEFAULT_PROMPT_FALLBACK


class TestMisc:
    def test_unescape(self):
        assert unescape_double_backslash(r"a\\nb") == r"a\nb"

    def test_grade_number(self):
        assert extract_grade_number("Grade 7 (junior)") == 7
        assert extract_grade_number("none") is None

    def test_age_range(self):
        assert calculate_age_range(7) == "12-15"

    def test_size_buckets(self):
        assert [size_getter_from_marks(m) for m in (1, 2, 3, 4, 99)] == [2, 5, 7, 10, 10]
