"""Geospatial subsystem: dependency-free WKT kernel + Spark bindings +
validation rules. Importing this package registers the geo rules into
the validation registry."""

from petk_spark.geo.rules import register as _register

_register()
