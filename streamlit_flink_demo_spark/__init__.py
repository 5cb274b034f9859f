"""streamlit_flink_demo_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of ``confluentinc/streamlit-flink-demo`` (studied read-only
at ``/root/reference``), re-expressed Spark-first:

- Spark SQL / DataFrame API for all relational operators (Catalyst
  plans, Tungsten execution, AQE at runtime).
- Structured Streaming for continuous queries, with a changelog
  (retract-stream) emission layer that reproduces Flink's
  ``+I/-U/+U/-D`` op semantics (reference: ``api/statements.py:160-169``).
- A statements-style submit/poll/paginate façade mirroring the
  reference's REST client surface (``api/statements.py:20-192``).
- LLM-data-pipeline extensions (dedup, similarity search, text
  analysis, multimodal plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"

from streamlit_flink_demo_spark.session import get_spark  # noqa: F401
