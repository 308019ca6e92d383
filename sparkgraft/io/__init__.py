from sparkgraft.io.readers import TABLES, load_tables, read_csv, read_table

__all__ = ["TABLES", "load_tables", "read_csv", "read_table"]
