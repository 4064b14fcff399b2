"""SQL frontend: lexer, parser, statement execution.

Covers the SQL surface the reference exposes (DataFusion SQL + the Exon
extensions from sql/parser.rs:26-72): SELECT queries, CREATE EXTERNAL TABLE
… STORED AS <fmt> … LOCATION …, COPY … TO … STORED AS, SET, DESCRIBE,
SHOW TABLES, EXPLAIN, and UDTF table functions (fasta_scan('path') …).
"""
