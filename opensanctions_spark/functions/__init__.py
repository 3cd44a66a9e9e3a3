"""Column-function library: the reference's cleaning/helper surface
(SURVEY §2.8 F1-F15) as pure JVM-side Spark column expressions.

Everything here stays inside whole-stage codegen — no Python UDFs in hot
paths. The few genuinely imperative validations (IBAN mod-97) use
`F.aggregate` folds over character arrays, still JVM-side.
"""
