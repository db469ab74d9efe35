"""Sources and sinks: CoNLL-U scan/serialize, table helpers."""
