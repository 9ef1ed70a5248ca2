"""autoencoder subpackage."""
