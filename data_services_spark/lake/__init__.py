from .table import CommitConflict, LakeTable, TableNotFound

__all__ = ["LakeTable", "CommitConflict", "TableNotFound"]
