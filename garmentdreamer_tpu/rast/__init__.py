"""rast subpackage."""
