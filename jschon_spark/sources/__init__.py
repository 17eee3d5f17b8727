"""Sources: synthetic web-page corpus generator + text extraction."""
