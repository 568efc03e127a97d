"""Canonical schemas, defined once.

The reference declares its state-vector schema three separate times
(consumer.py:68-86, process_silver.py:28-50, process_silver.py:92-97)
with drift between copies (the ``sensors`` field, SURVEY §1.2). This
module is the single source of truth for the port.
"""

from __future__ import annotations

from pyspark.sql import types as T

# OpenSky state vector (18 positional fields) + enrichment columns.
# Types per SURVEY §1.3; all nullable except keys, matching the
# reference's forgiving ingestion.
STATE_VECTOR_SCHEMA = T.StructType(
    [
        T.StructField("icao24", T.StringType(), False),
        T.StructField("callsign", T.StringType(), True),
        T.StructField("origin_country", T.StringType(), True),
        T.StructField("time_position", T.LongType(), True),
        T.StructField("last_contact", T.LongType(), False),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("baro_altitude_m", T.DoubleType(), True),
        T.StructField("on_ground", T.BooleanType(), True),
        T.StructField("velocity_ms", T.DoubleType(), True),
        T.StructField("true_track", T.DoubleType(), True),
        T.StructField("vertical_rate_ms", T.DoubleType(), True),
        T.StructField("sensors", T.ArrayType(T.IntegerType()), True),
        T.StructField("geo_altitude_m", T.DoubleType(), True),
        T.StructField("squawk", T.StringType(), True),
        T.StructField("spi", T.BooleanType(), True),
        T.StructField("position_source", T.IntegerType(), True),
        T.StructField("category", T.IntegerType(), True),
    ]
)

# Field order of the raw positional JSON array on the wire
# (producer.py:89-96): index i of the array maps to field i above.
STATE_VECTOR_FIELDS = [f.name for f in STATE_VECTOR_SCHEMA.fields]

# Aircraft metadata dimension (consumer.py:31-37): pruned to five
# columns of the ~30-column CSV.
AIRCRAFT_META_SCHEMA = T.StructType(
    [
        T.StructField("icao24", T.StringType(), False),
        T.StructField("model", T.StringType(), True),
        T.StructField("operator", T.StringType(), True),
        T.StructField("manufacturerName", T.StringType(), True),
        T.StructField("categoryDescription", T.StringType(), True),
    ]
)

# Enriched silver-zone schema = state vector + metadata columns
# (process_silver.py:111,247-248).
SILVER_SCHEMA = T.StructType(
    STATE_VECTOR_SCHEMA.fields
    + [f for f in AIRCRAFT_META_SCHEMA.fields if f.name != "icao24"]
)
