"""Interactive 6DoF viewer (GlViewer equivalent): host serves the fused
stream, the browser's WebGL2 runs the RigScene pipeline."""
