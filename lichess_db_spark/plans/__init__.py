from .catalog import QUERIES, QueryDef, oracle_sql_map, queries_map  # noqa: F401
