"""Relations: R1CS constraint system and Plonk circuit structures."""
