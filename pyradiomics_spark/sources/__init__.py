"""Sources & sinks: synthetic pages corpus, testdata readers, checkpointed
parquet/Iceberg sinks with resume ledger."""
