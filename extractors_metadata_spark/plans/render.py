"""Multi-format metadata rendering (F17): one parse, three renderings.

The reference's netcdf extractor renders the same parsed header as CDL, XML,
and JSON via three ``ncks`` subprocess calls
(``/root/reference/netcdf/terra_netcdf.py:37,46,55``). The engine parses once
and renders all three JVM-side (``to_json`` + ``format_string`` inside
codegen) — JSON is canonical, XML/CDL are frozen templates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIELDS = ["sensor", "date", "pos_x", "pos_y", "pos_z", "fov_x", "fov_y"]


def multi_render(parsed: DataFrame) -> DataFrame:
    """parsed metadata -> (url, md_json, md_xml, md_cdl)."""
    md = F.struct(*[F.col(c) for c in _FIELDS])
    xml = F.format_string(
        "<metadata><sensor>%s</sensor><date>%s</date>"
        "<position x=\"%.6f\" y=\"%.6f\" z=\"%.6f\"/>"
        "<fov x=\"%.6f\" y=\"%.6f\"/></metadata>",
        F.col("sensor"), F.col("date"),
        F.coalesce("pos_x", F.lit(0.0)), F.coalesce("pos_y", F.lit(0.0)),
        F.coalesce("pos_z", F.lit(0.0)),
        F.coalesce("fov_x", F.lit(0.0)), F.coalesce("fov_y", F.lit(0.0)),
    )
    cdl = F.format_string(
        'capture {\n  :sensor = "%s" ;\n  :date = "%s" ;\n'
        "  :position = %.6f, %.6f, %.6f ;\n  :fov = %.6f, %.6f ;\n}",
        F.col("sensor"), F.col("date"),
        F.coalesce("pos_x", F.lit(0.0)), F.coalesce("pos_y", F.lit(0.0)),
        F.coalesce("pos_z", F.lit(0.0)),
        F.coalesce("fov_x", F.lit(0.0)), F.coalesce("fov_y", F.lit(0.0)),
    )
    return parsed.select(
        "url",
        F.to_json(md).alias("md_json"),
        xml.alias("md_xml"),
        cdl.alias("md_cdl"),
    )
