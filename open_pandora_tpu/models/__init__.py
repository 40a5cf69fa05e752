"""Model stacks: VAE, UNet3D, encoders (OpenCLIP/Resampler), LLM (LLaMA +
CLIP tower + clustering), connector, and the composite WorldModel."""
