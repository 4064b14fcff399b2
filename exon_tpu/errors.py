"""Error hierarchy (reference: exon-core/src/error/)."""


class ExonError(Exception):
    """Base error for the exon-tpu engine."""


class InvalidSequenceError(ExonError):
    pass


class InvalidRegionError(ExonError):
    """Invalid genomic region / chromosome / interval
    (reference: exon-core/src/error/invalid_region.rs etc.)."""


class PlanError(ExonError):
    pass


class SqlError(ExonError):
    pass


class ExecutionError(ExonError):
    pass
