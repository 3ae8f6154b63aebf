"""Pure-numpy sketch kernels (no Spark imports): testable against the
reference golden files with zero JVM in the loop."""
