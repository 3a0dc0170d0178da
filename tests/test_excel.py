"""Excel source/sink (stdlib OOXML subset) — closes S3 + the xlsx half of
S9 from SURVEY.md §2.1."""

from __future__ import annotations

import os
import zipfile

import pytest

from data_profiler_spark.sinks.excel import (
    list_sheets,
    read_xlsx,
    read_xlsx_rows,
    write_xlsx,
)


def test_multisheet_roundtrip(spark, tmp_path):
    profile = spark.createDataFrame(
        [("dur_ms", "mean", 812.5), ("dur_ms", "null_rate", 0.01)],
        "column string, metric string, value double",
    )
    verdicts = spark.createDataFrame(
        [("pk_unique", 0, True, 0), ("pk_unique", 1, False, 3)],
        "check_name string, partition_id int, passed boolean, violation_count long",
    )
    path = write_xlsx(
        [("profile", profile), ("verdicts", verdicts)], str(tmp_path / "report.xlsx")
    )
    assert list_sheets(path) == ["profile", "verdicts"]

    hdr, rows = read_xlsx_rows(path, "profile")
    assert hdr == ["column", "metric", "value"]
    assert sorted(rows) == [["dur_ms", "mean", 812.5], ["dur_ms", "null_rate", 0.01]]

    hdr2, rows2 = read_xlsx_rows(path, "verdicts")
    assert hdr2 == ["check_name", "partition_id", "passed", "violation_count"]
    assert ["pk_unique", 1, False, 3] in rows2

    # S3 scan: worksheet → DataFrame with explicit schema, typed readback
    df = read_xlsx(
        spark, path, "verdicts",
        "check_name string, partition_id int, passed boolean, violation_count long",
    )
    got = {(r["partition_id"]): (r["passed"], r["violation_count"]) for r in df.collect()}
    assert got == {0: (True, 0), 1: (False, 3)}
    # schema-less read is all-strings (the reference's dtype=str probe read)
    probed = read_xlsx(spark, path, "verdicts")
    assert [f.dataType.simpleString() for f in probed.schema.fields] == ["string"] * 4
    assert {r["violation_count"] for r in probed.collect()} == {"0", "3"}


def test_cell_guard_replaces_oversized_sheet(spark, tmp_path):
    big = spark.range(200).selectExpr("id", "id * 2 as dbl")
    path = write_xlsx([("big", big)], str(tmp_path / "guard.xlsx"), cell_limit=100)
    hdr, rows = read_xlsx_rows(path, "big")
    assert hdr == ["skipped"] and "workbook guard" in rows[0][0]


def test_special_values_and_sheetname_sanitize(spark, tmp_path):
    df = spark.createDataFrame(
        [("a<b&c", None, 1.5), ("plain", "x", -2.0)],
        "s string, maybe string, v double",
    )
    path = write_xlsx([("bad/name?*", df)], str(tmp_path / "special.xlsx"))
    assert list_sheets(path) == ["bad_name__"]
    hdr, rows = read_xlsx_rows(path)
    assert ["a<b&c", None, 1.5] in rows  # XML-escaped and back, None stays empty

    # the workbook is genuine OOXML: required parts present
    with zipfile.ZipFile(path) as z:
        names = z.namelist()
    assert "[Content_Types].xml" in names and "xl/workbook.xml" in names


def test_shared_strings_read_path(spark, tmp_path):
    """Workbooks written by Excel/openpyxl use a sharedStrings table rather
    than inline strings — hand-build one and read it back."""
    path = str(tmp_path / "ss.xlsx")
    main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg = "http://schemas.openxmlformats.org/package/2006/relationships"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{pkg}">'
            f'<Relationship Id="rId1" Type="{rel}/officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook xmlns="{main}" xmlns:r="{rel}">'
            '<sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{pkg}">'
            f'<Relationship Id="rId1" Type="{rel}/worksheet" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr(
            "xl/sharedStrings.xml",
            f'<?xml version="1.0"?><sst xmlns="{main}" count="2" uniqueCount="2">'
            "<si><t>name</t></si><si><t>alpha</t></si></sst>",
        )
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet xmlns="{main}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
            '<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
    hdr, rows = read_xlsx_rows(path)
    assert hdr == ["name"] and rows == [["alpha"]]


def test_missing_sheet_and_empty_errors(spark, tmp_path):
    df = spark.createDataFrame([("x",)], "a string")
    path = write_xlsx([("only", df)], str(tmp_path / "one.xlsx"))
    with pytest.raises(ValueError):
        read_xlsx_rows(path, "nope")
    assert os.path.exists(path)


from hypothesis import given, settings
from hypothesis import strategies as st

# Control chars ARE in scope: the writer escapes XML-illegal chars with
# OOXML _xNNNN_ sequences (and protects literal "_xNNNN_" text), so any
# non-surrogate string must round-trip exactly. Surrogates stay excluded
# (not representable in well-formed UTF-8 interchange generally).
_xml_text = st.text(
    st.characters(blacklist_categories=("Cs",)),
    max_size=40,
)
_cell = st.one_of(
    st.none(),
    _xml_text,
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_cell, _cell, _cell), min_size=1, max_size=8))
def test_xlsx_cell_roundtrip_property(tmp_path_factory, rows):
    """ANY grid of None/str/bool/int/float cells survives write→read
    bit-for-bat (floats via repr, strings XML-escaped). No Spark needed —
    the writer's collect layer is exercised by the integration tests."""
    import zipfile as _zf

    from data_profiler_spark.sinks import excel as xl

    path = str(tmp_path_factory.mktemp("xlsx") / "prop.xlsx")
    header = ["a", "b", "c"]
    sheet = xl._sheet_xml(header, [list(r) for r in rows])
    # write a minimal workbook around the sheet using the public writer's
    # building blocks (bypasses Spark collect; same XML path)
    with _zf.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", xl._CONTENT_TYPES.format(
            sheet_overrides='<Override PartName="/xl/worksheets/sheet1.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'))
        z.writestr("_rels/.rels", xl._ROOT_RELS)
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{xl._MAIN_NS}" xmlns:r="{xl._REL_NS}">'
            '<sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{xl._PKG_REL_NS}">'
            f'<Relationship Id="rId1" Type="{xl._REL_NS}/worksheet" '
            'Target="worksheets/sheet1.xml"/></Relationships>',
        )
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    hdr, got = xl.read_xlsx_rows(path)
    assert hdr == header
    assert len(got) == len(rows)
    for want_row, got_row in zip(rows, got):
        for want, g in zip(want_row, got_row):
            if want is None or (isinstance(want, str) and want == ""):
                assert g is None or g == ""  # empty inline string ≡ empty cell
            elif isinstance(want, bool):
                assert g is want
            elif isinstance(want, float):
                assert isinstance(g, (int, float)) and float(g) == want
            else:
                assert g == want, (want, g)


def test_control_chars_and_x_sequences_roundtrip(spark, tmp_path):
    """Dirty-data strings: XML-illegal control chars round-trip via OOXML
    _xNNNN_ escaping, and literal _xNNNN_ text is protected (_x005F_)."""
    from data_profiler_spark.sinks.excel import read_xlsx_rows, write_xlsx

    vals = ["bad\x01key", "_x0001_", "_x005F_", "tab\tok", "nul\x00"]
    df = spark.createDataFrame([tuple(vals)], "a string, b string, c string, d string, e string")
    path = str(tmp_path / "ctrl.xlsx")
    write_xlsx([("s", df)], path)
    header, rows = read_xlsx_rows(path)
    assert rows[0] == vals


def test_sheet_name_quotes_and_collisions(spark, tmp_path):
    """Quoted sheet names survive (attribute escaping) and sanitized-name
    collisions get deduplicated suffixes instead of invalid duplicates."""
    from data_profiler_spark.sinks.excel import list_sheets, read_xlsx_rows, write_xlsx

    df = spark.createDataFrame([(1,)], "x int")
    path = str(tmp_path / "names.xlsx")
    write_xlsx([('drift "psi"', df), ("a/b", df), ("a:b", df)], path)
    names = list_sheets(path)
    assert names[0] == 'drift "psi"'
    assert names[1] == "a_b" and names[2] != names[1] and names[2].startswith("a_b")
    for n in names:
        assert read_xlsx_rows(path, n)[0] == ["x"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_xlsx([], str(tmp_path / "empty.xlsx"))


def test_foreign_workbook_rless_cells_and_absolute_targets(tmp_path):
    """Spec-valid producer quirks: cells without r attributes (positional)
    and absolute relationship targets ('/xl/...')."""
    import zipfile as _zf

    from data_profiler_spark.sinks import excel as xl
    from data_profiler_spark.sinks.excel import read_xlsx_rows

    path = str(tmp_path / "foreign.xlsx")
    sheet = (
        '<?xml version="1.0"?>'
        f'<worksheet xmlns="{xl._MAIN_NS}"><sheetData>'
        '<row><c t="inlineStr"><is><t>h1</t></is></c>'
        '<c t="inlineStr"><is><t>h2</t></is></c></row>'
        '<row><c t="inlineStr"><is><t>v1</t></is></c><c><v>7</v></c></row>'
        "</sheetData></worksheet>"
    )
    with _zf.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", xl._CONTENT_TYPES.format(
            sheet_overrides='<Override PartName="/xl/worksheets/sheet1.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'))
        z.writestr("_rels/.rels", xl._ROOT_RELS)
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0"?>'
            f'<workbook xmlns="{xl._MAIN_NS}" xmlns:r="{xl._REL_NS}">'
            '<sheets><sheet name="s" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0"?>'
            f'<Relationships xmlns="{xl._PKG_REL_NS}">'
            '<Relationship Id="rId1" Type="t" Target="/xl/worksheets/sheet1.xml"/>'
            "</Relationships>",
        )
        z.writestr("xl/worksheets/sheet1.xml", sheet)
    header, rows = read_xlsx_rows(path)
    assert header == ["h1", "h2"]
    assert rows == [["v1", 7]]


def test_decimal_and_timestamp_cells_keep_usable_types(spark, tmp_path):
    """Decimal columns round-trip as NUMBERS (not inline strings); timestamp
    /date columns are written as ISO text deliberately (documented coercion
    — no styles.xml in the minimal writer), so they stay lossless and
    sortable."""
    df = spark.createDataFrame(
        [("a", "12345.67", "2026-01-02 03:04:05", "2026-01-02")],
        "k string, amt string, ts string, d string",
    ).selectExpr(
        "k",
        "cast(amt as decimal(10,2)) amt",
        "cast(ts as timestamp) ts",
        "cast(d as date) d",
    )
    path = write_xlsx([("t", df)], str(tmp_path / "typed.xlsx"))
    hdr, rows = read_xlsx_rows(path, "t")
    assert hdr == ["k", "amt", "ts", "d"]
    (row,) = rows
    assert isinstance(row[1], float) and row[1] == 12345.67  # number cell
    assert row[2] == "2026-01-02 03:04:05"
    assert row[3] == "2026-01-02"


def test_foreign_workbook_date_styled_serials(tmp_path):
    """Foreign workbooks carry dates as NUMERIC serials + a date-styled xf
    (built-in fmt 14/22/45 or a custom yyyy-mm-dd numFmt); read_xlsx must
    yield the writer's documented ISO text for them while leaving
    plain-styled numbers numeric — the r4 verdict's Excel robustness item."""
    import zipfile as _zf

    from data_profiler_spark.sinks.excel import read_xlsx_rows

    path = str(tmp_path / "dates.xlsx")
    main = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rel = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pkg = "http://schemas.openxmlformats.org/package/2006/relationships"
    with _zf.ZipFile(path, "w") as z:
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>",
        )
        z.writestr(
            "_rels/.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{pkg}">'
            f'<Relationship Id="rId1" Type="{rel}/officeDocument" Target="xl/workbook.xml"/></Relationships>',
        )
        z.writestr(
            "xl/workbook.xml",
            f'<?xml version="1.0"?><workbook xmlns="{main}" xmlns:r="{rel}">'
            '<sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<?xml version="1.0"?><Relationships xmlns="{pkg}">'
            f'<Relationship Id="rId1" Type="{rel}/worksheet" Target="worksheets/sheet1.xml"/></Relationships>',
        )
        # xf 0: General (not a date). xf 1: builtin 14 (m/d/yyyy).
        # xf 2: builtin 22 (m/d/yy h:mm). xf 3: builtin 45 (mm:ss, time).
        # xf 4: custom 164 = yyyy-mm-dd (date tokens outside quotes).
        # xf 5: custom 165 = "m" literal quoted → NOT a date format.
        z.writestr(
            "xl/styles.xml",
            f'<?xml version="1.0"?><styleSheet xmlns="{main}">'
            '<numFmts count="2">'
            '<numFmt numFmtId="164" formatCode="yyyy-mm-dd"/>'
            '<numFmt numFmtId="165" formatCode="&quot;m&quot;0.00"/>'
            "</numFmts>"
            '<cellXfs count="6">'
            '<xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="22"/>'
            '<xf numFmtId="45"/><xf numFmtId="164"/><xf numFmtId="165"/>'
            "</cellXfs></styleSheet>",
        )
        # serial 45292 = 2024-01-01; 45292.5 = noon; 0.75 = 18:00:00
        z.writestr(
            "xl/worksheets/sheet1.xml",
            f'<?xml version="1.0"?><worksheet xmlns="{main}"><sheetData>'
            '<row r="1">'
            '<c r="A1" t="inlineStr"><is><t>d14</t></is></c>'
            '<c r="B1" t="inlineStr"><is><t>d22</t></is></c>'
            '<c r="C1" t="inlineStr"><is><t>t45</t></is></c>'
            '<c r="D1" t="inlineStr"><is><t>d164</t></is></c>'
            '<c r="E1" t="inlineStr"><is><t>plain</t></is></c>'
            '<c r="F1" t="inlineStr"><is><t>fake_m</t></is></c>'
            '<c r="G1" t="inlineStr"><is><t>neg</t></is></c>'
            "</row>"
            '<row r="2">'
            '<c r="A2" s="1"><v>45292</v></c>'
            '<c r="B2" s="2"><v>45292.5</v></c>'
            '<c r="C2" s="3"><v>0.75</v></c>'
            '<c r="D2" s="4"><v>45292</v></c>'
            '<c r="E2" s="0"><v>45292</v></c>'
            '<c r="F2" s="5"><v>45292</v></c>'
            '<c r="G2" s="1"><v>-0.25</v></c>'
            "</row>"
            "</sheetData></worksheet>",
        )
    hdr, rows = read_xlsx_rows(path)
    assert hdr == ["d14", "d22", "t45", "d164", "plain", "fake_m", "neg"]
    got = dict(zip(hdr, rows[0]))
    assert got["d14"] == "2024-01-01"  # builtin date style → ISO date text
    assert got["d22"] == "2024-01-01 12:00:00"  # datetime style → ISO stamp
    assert got["t45"] == "18:00:00"  # serial < 1 + time style → time-of-day
    assert got["d164"] == "2024-01-01"  # custom yyyy-mm-dd numFmt
    assert got["plain"] == 45292  # General style stays numeric
    assert got["fake_m"] == 45292  # quoted "m" is a literal, not a date token
    # r5 review finding: a NEGATIVE serial is invalid in Excel itself
    # (renders #####) — it must fall through as the raw dirty number for
    # coercion checks to count, never launder into a plausible time-of-day
    assert got["neg"] == -0.25
