"""Driver-side schema compilation: catalog, parsing, keyword metadata."""
