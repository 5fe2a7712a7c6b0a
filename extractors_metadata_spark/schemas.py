"""Engine table schemas (fixed StructTypes; dynamic metadata carried as maps).

The input table shape is mandated by BASELINE.json ``input_hint``:
(url:string, warc_ts:timestamp, html:binary, text:string, lang:string).
The embedded sensor metadata document mirrors
``/root/reference/sensorposition/test.json`` (all leaf values strings, typos
preserved) and is parsed as map<string,string> sections per SURVEY.md D3.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WEBPAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# D3: LemnaTec-style nested metadata; known core declared, variable keys as maps.
SS = StringType()
LEMNATEC_MD = StructType(
    [
        StructField(
            "lemnatec_measurement_metadata",
            StructType(
                [
                    StructField("user_given_metadata", MapType(SS, SS), True),
                    StructField("gantry_system_fixed_metadata", MapType(SS, SS), True),
                    StructField("gantry_system_variable_metadata", MapType(SS, SS), True),
                    StructField("sensor_fixed_metadata", MapType(SS, SS), True),
                    StructField("sensor_variable_metadata", MapType(SS, SS), True),
                ]
            ),
            True,
        ),
        StructField(
            "site_metadata",
            StructType([StructField("sitename", SS, True)]),
            True,
        ),
        StructField("dataset_name", SS, True),
    ]
)

# D7: plot polygon dimension (broadcast side of the spatial joins). ``ring`` is a
# closed lon/lat ring; ``cells_r9`` the precomputed covering cells at the join res.
PLOTS = StructType(
    [
        StructField("plot_id", StringType(), False),
        StructField("range", IntegerType(), False),
        StructField("pass", IntegerType(), False),
        StructField("mac_entry", IntegerType(), False),
        StructField("ring", ArrayType(ArrayType(DoubleType())), False),
        StructField("cells_r9", ArrayType(LongType()), True),
    ]
)

# D6: output fact table (geostreams datapoint analog).
DATAPOINTS = StructType(
    [
        StructField("url", StringType(), False),
        StructField("plot_id", StringType(), True),
        StructField("matched_via", StringType(), True),  # 'contains' | 'nearest'
        StructField("centroid_lon", DoubleType(), True),
        StructField("centroid_lat", DoubleType(), True),
        StructField("footprint", StringType(), True),  # GeoJSON polygon
        StructField("scan_time", TimestampType(), True),
        StructField("date", StringType(), True),
        StructField("stream", StringType(), True),
        StructField("properties", MapType(SS, SS), True),
    ]
)

TILES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("z", IntegerType(), False),
        StructField("x", LongType(), False),
        StructField("y", LongType(), False),
    ]
)
