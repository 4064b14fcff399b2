"""Write path: COPY ... TO sinks (FASTA/FASTQ/CSV/Parquet serializers)."""
