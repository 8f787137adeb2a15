"""Column-expression function library (all JVM-side, no Python UDFs)."""
