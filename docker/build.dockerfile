# Reproduction container for the dgl_tpu benchmark suite (reference D1
# twin: /root/reference/docker/build.dockerfile + docker-compose.yaml —
# theirs pins CUDA 11.1/torch 1.8.1 for one V100; this pins the JAX/TPU
# stack for one v5e host).
#
# Build:  docker build -f docker/build.dockerfile -t dgl-tpu .
# Run on a TPU VM (v5e):
#   docker run --privileged --net=host \
#     -v $PWD:/io -w /io dgl-tpu \
#     python benchmarks/generate_result.py --suite full
# (--privileged + host networking expose /dev/vfio TPU devices, the TPU
# equivalent of the compose file's nvidia device reservation.)

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

# the stack this suite was validated against
RUN pip install --no-cache-dir \
        "jax[tpu]==0.9.0" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        flax==0.12.3 optax==0.2.6 orbax-checkpoint chex einops \
        numpy==2.0.2 pandas pytest

WORKDIR /io
CMD ["python", "benchmarks/generate_result.py", "--suite", "full"]
