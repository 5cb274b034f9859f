"""Sources and sinks: parquet catalog, Kafka+Avro connector, memory streams."""
