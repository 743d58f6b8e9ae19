"""Subpackage of w4h_etl_container_spark."""
