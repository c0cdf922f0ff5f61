"""datafusion_pinot_spark — PySpark-native analytics engine with the
capabilities of the reference DataFusion/Pinot integration.

Division of labor (mirrors the reference's, SURVEY.md top matter): this
package supplies storage + catalog + scan (`sources/`, `catalog.py`) while
Spark SQL / Catalyst supplies the entire relational layer — exactly as the
reference supplies a TableProvider/ExecutionPlan and delegates every operator
to DataFusion (reference datafusion-pinot/src/table.rs, exec.rs).

Beyond parity, `operators/` adds LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing) designed for
100 TB scale, and `streaming/` covers Structured Streaming equivalents.
"""

__version__ = "0.1.0"
