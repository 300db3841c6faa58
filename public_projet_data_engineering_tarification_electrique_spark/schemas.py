"""Declared schemas — the reference declares schema everywhere (DDL at
table creation ``reference:README.md:73-74``, dtype maps on CSV read
``reference:0_insert_conso_an_ville_in_bq.py:43-47,94-98``, required
field validation ``reference:api.py:24-33``). We keep that discipline:
every source read in this engine is schema-declared, never inferred.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Domain tables (reference data model, SURVEY.md §1.1) ---------------

#: ``tarification_elec.conso_an_ville`` — annual mean residential
#: consumption per commune (reference:README.md:73). Forecast rows
#: (2023-2025) may carry NULL conso (sklearn failure path,
#: reference:0_insert_conso_an_ville_in_bq.py:67-69).
CONSO_AN_VILLE = T.StructType(
    [
        T.StructField("nom_commune", T.StringType(), False),
        T.StructField("code_commune", T.StringType(), False),
        T.StructField("conso_moyenne_mwh", T.DoubleType(), True),
        T.StructField("annee", T.IntegerType(), False),
    ]
)

#: ``tarification_elec.conso_jour_region`` — daily mean consumption per
#: region (reference:README.md:74).
CONSO_JOUR_REGION = T.StructType(
    [
        T.StructField("code_insee_region", T.StringType(), False),
        T.StructField("libelle_region", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("conso_mwh", T.DoubleType(), True),
    ]
)

#: Raw éco2mix extract shape (pre-aggregation), selected at
#: reference:airflow/dags/insert_conso_jour_region_in_bq.py:57-61.
ECO2MIX_RAW = T.StructType(
    [
        T.StructField("code_insee_region", T.StringType(), False),
        T.StructField("libelle_region", T.StringType(), False),
        T.StructField("date", T.StringType(), False),
        T.StructField("date_heure", T.TimestampType(), False),
        T.StructField("consommation", T.DoubleType(), True),
    ]
)

#: Raw Enedis extract shape, selected at
#: reference:0_insert_conso_an_ville_in_bq.py:24.
ENEDIS_RAW = T.StructType(
    [
        T.StructField("nom_commune", T.StringType(), False),
        T.StructField("code_commune", T.StringType(), False),
        T.StructField("conso_moyenne_mwh", T.DoubleType(), True),
        T.StructField("annee", T.IntegerType(), False),
        T.StructField("code_grand_secteur", T.StringType(), True),
    ]
)

#: Serving input record — the five required fields validated at
#: reference:api.py:107; canonical fixture reference:tests/test_api.py:14-20.
PRICING_REQUEST = T.StructType(
    [
        T.StructField("libelle_region", T.StringType(), False),
        T.StructField("nom_commune", T.StringType(), False),
        T.StructField("code_commune", T.StringType(), False),
        T.StructField("nb_personne", T.IntegerType(), False),
        T.StructField("nb_m2", T.IntegerType(), False),
    ]
)

#: Required fields for request validation (reference:api.py:24-33,107).
PRICING_REQUEST_REQUIRED = frozenset(
    ("libelle_region", "nom_commune", "code_commune", "nb_personne", "nb_m2")
)
