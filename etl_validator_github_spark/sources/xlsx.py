"""Minimal stdlib-only XLSX writer (S4).

The reference writes bank files to Excel driver-side via pandas
(GEN:563-581). This environment has no xlsx engine (openpyxl /
xlsxwriter), so this module serializes the OOXML package directly with
``zipfile`` + hand-built XML — no dependencies, deterministic output.

Scope is exactly what S4 needs: one sheet, a header row, every cell an
inline string (the bank-file writer widens values to strings anyway, and
inline strings avoid a sharedStrings part). Like the reference, this is
a driver-side sink for small exports — never a distributed write path.
"""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _cell(value: object) -> str:
    if value is None:
        return "<c/>"
    return f"<c t=\"inlineStr\"><is><t>{escape(str(value))}</t></is></c>"


def _sheet_xml(header: list[str], rows: list[tuple]) -> str:
    out = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main">',
        "<sheetData>",
        "<row r=\"1\">" + "".join(_cell(h) for h in header) + "</row>",
    ]
    for i, row in enumerate(rows, start=2):
        out.append(
            f"<row r=\"{i}\">" + "".join(_cell(v) for v in row) + "</row>"
        )
    out.append("</sheetData></worksheet>")
    return "".join(out)


def write_xlsx(path: str, header: list[str], rows: list[tuple]) -> None:
    """Write one inline-string worksheet as a valid .xlsx package."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", _sheet_xml(header, rows))


def read_xlsx_cells(path: str) -> list[list[str | None]]:
    """Parse an inline-string sheet back (test/verification aid)."""
    from xml.etree import ElementTree as ET

    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as z:
        root = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    out: list[list[str | None]] = []
    for row in root.iter(f"{ns}row"):
        cells: list[str | None] = []
        for c in row.iter(f"{ns}c"):
            t = c.find(f"{ns}is/{ns}t")
            cells.append(None if t is None else (t.text or ""))
        out.append(cells)
    return out
