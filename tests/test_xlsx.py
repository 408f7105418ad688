"""XLSX report export: stdlib writer round-trip + the ExtractWriter
report surface (reference Excel export graft, README.md:29)."""

import zipfile

import pytest

from ocr_spark.xlsx import XLSX_MAX_ROWS, col_letter, read_xlsx, write_xlsx


def test_col_letters():
    assert [col_letter(i) for i in (0, 1, 25, 26, 27, 51, 52, 701, 702)] == [
        "A", "B", "Z", "AA", "AB", "AZ", "BA", "ZZ", "AAA",
    ]


def test_round_trip_types_and_escaping(tmp_path):
    p = str(tmp_path / "r.xlsx")
    cols = ["name", "n", "ratio", "flag", "note"]
    rows = [
        ["a<b>&\"'", 7, 0.25, True, "multi\nline"],
        ["plain", -3, 1.5, False, ""],
        [None, 0, 0.0, True, "x\x01y"],  # control char must be stripped
    ]
    n = write_xlsx(p, cols, rows)
    assert n == 3
    rcols, rrows = read_xlsx(p)
    assert rcols == cols
    assert rrows[0] == ["a<b>&\"'", 7, 0.25, True, "multi\nline"]
    assert rrows[1] == ["plain", -3, 1.5, False, ""]
    assert rrows[2][0] is None  # None survives as an empty cell
    assert rrows[2][4] == "xy"
    # it is a real OOXML package
    with zipfile.ZipFile(p) as z:
        assert "[Content_Types].xml" in z.namelist()
        assert "xl/worksheets/sheet1.xml" in z.namelist()


def test_row_limit_enforced(tmp_path):
    p = str(tmp_path / "big.xlsx")

    def gen():
        for i in range(XLSX_MAX_ROWS + 5):
            yield [i]

    with pytest.raises(ValueError, match="report, not a data sink"):
        write_xlsx(p, ["i"], gen())


def test_extract_writer_xlsx_report(spark, tiny_transcripts, tmp_path):
    from ocr_spark.io import ExtractWriter

    w = ExtractWriter(str(tmp_path / "wh"))
    sdf = spark.createDataFrame(tiny_transcripts)
    w.run(spark, sdf, "rx", n_buckets=4, group_size=4)
    out = str(tmp_path / "report.xlsx")
    n = w.export_xlsx(spark, out, limit=50)
    assert n == 50
    cols, rows = read_xlsx(out)
    assert cols[:2] == ["conv_id", "turn_idx"]
    assert "cand_a_text" in cols and "cand_c_score" in cols
    assert len(rows) == 50
    # stable ordering contract holds in the report
    keys = [(r[0], r[1]) for r in rows]
    assert keys == sorted(keys)
