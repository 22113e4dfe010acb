"""Operator DSL: Stream / WindowedStream over DataFrames.

The PySpark re-expression of the reference's fluent query surface
(tools/.../groovy/Stream.java, WindowedStream.java; Beam implementation
beam/tools/.../BeamStream.java, BeamWindowedStream.java).
"""

from proxima_platform_spark.operators.stream import Stream
from proxima_platform_spark.operators.windowed import WindowedStream, Windowing

__all__ = ["Stream", "WindowedStream", "Windowing"]
