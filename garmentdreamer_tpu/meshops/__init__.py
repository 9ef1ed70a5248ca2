"""meshops subpackage."""
