"""Pipeline assembly: the `railgun process` ETL entry point re-expressed as
read -> DFL-compiled plan -> write (SURVEY §3.1)."""
