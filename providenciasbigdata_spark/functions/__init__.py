"""Scalar/array function library: text analysis and vector math
(SURVEY.md §2.5 C-X3/C-X5). All hot-path functions are built-in
``pyspark.sql.functions`` compositions (JVM-side, codegen); Python
appears only in clearly-marked cold paths.
"""
