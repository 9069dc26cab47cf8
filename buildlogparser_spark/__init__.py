"""buildlogparser_spark — a PySpark-native parse→enrich→route→aggregate engine.

A from-scratch reimagining of the query/data-processing capabilities of the
reference Swift package ``aelam/BuildLogParser`` (a line→Diagnostic rule engine,
see ``/root/reference``) as an idiomatic Spark pipeline over transcript tables
``(conv_id, turn_idx, role, text, tool, ts)``.

Design stance (SURVEY.md §7): rules are *data* (``rules.table``), the hot path
is JVM-side column expressions (``operators.classify``), the fully-stateful
path is a vectorized per-conversation pandas state machine
(``operators.assemble``), and everything downstream (enrich/route/aggregate)
is plain DataFrame ops that Catalyst optimizes.
"""

__version__ = "0.1.0"
