"""normal subpackage."""
