"""User-extensible function surface (UDF/UDAF/UDTF).

The reference has no user-extensible functions (SURVEY §2 Table B: the
only user "code" is the SQL predicate string, config/config.go:48);
this package supplies the surface a Spark-native engine offers instead.
Everything here is the *slow path* by design — hot-path operators stay
on built-in ``pyspark.sql.functions`` (JVM, whole-stage codegen), and
these exist to prove the extension points work end-to-end with
Arrow-batched transfer where available.
"""

from .udxf import (
    TokenizeUDTF,
    minmax_norm_pdf,
    register_udtfs,
    weighted_avg_quantized,
)

__all__ = [
    "TokenizeUDTF",
    "minmax_norm_pdf",
    "register_udtfs",
    "weighted_avg_quantized",
]
