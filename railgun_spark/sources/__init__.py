"""Sources/sinks: multi-format multi-scheme IO (SURVEY §1.3) and the
driver-testdata table loaders."""
