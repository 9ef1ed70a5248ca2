"""systems subpackage."""
