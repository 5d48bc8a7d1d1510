"""Sources and sinks (SURVEY.md §2.1): REST/JSON ingest, file scans, JDBC."""
