"""Sources: page-table synthesis and readers."""
