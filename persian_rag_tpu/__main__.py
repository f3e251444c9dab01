"""CLI: python -m persian_rag_tpu <command>.

Commands mirror the reference's phase scripts plus serve/bench:
  phase1 | phase2 | phase3 | phase4 | run-all | fast-test | status |
  ui | serve | gen-serve | bench

`gen-serve` is the stand-in for the reference's external llama.cpp
server process (reference: src/llama_client.py:10 expects
http://127.0.0.1:8080): it serves the JAX Llama-architecture decoder
behind the same /completion + /v1/chat/completions HTTP contract, with
request micro-batching through the batched device decode loop.
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="persian_rag_tpu")
    parser.add_argument(
        "command",
        choices=[
            "phase1", "phase2", "phase3", "phase4", "phase4-enhanced",
            "create-embeddings", "run-all",
            "fast-test", "status", "ui", "serve", "gen-serve", "bench",
            "gguf-export",
        ],
    )
    parser.add_argument("--config", default="config.yaml")
    parser.add_argument("--tiny", action="store_true",
                        help="use small encoder architectures (smoke runs)")
    parser.add_argument("--mesh-corpus", type=int, default=1)
    parser.add_argument("--mesh-data", type=int, default=1)
    parser.add_argument("--methods", default=None,
                        help="comma list for phase4 (bm25,tfidf,dense,hybrid)")
    parser.add_argument("--port", type=int, default=None,
                        help="port for serve (default 8200) / gen-serve "
                             "(default 8080, the reference llama.cpp port)")
    parser.add_argument("--checkpoint", default=None,
                        help="gen-serve: HF LlamaForCausalLM checkpoint dir "
                             "(torch .bin/.safetensors); omitted = random "
                             "weights (smoke serving)")
    parser.add_argument("--force", action="store_true",
                        help="create-embeddings: rebuild existing indices")
    parser.add_argument("--verify", action="store_true",
                        help="create-embeddings: reload + test-search "
                             "every saved index instead of building")
    parser.add_argument("--max-batch", type=int, default=8,
                        help="gen-serve: micro-batch cap for concurrent "
                             "requests (batch-32 measured 4.3k tok/s "
                             "aggregate vs 1.7k at batch-8; each distinct "
                             "batch size compiles once). With "
                             "--mesh-corpus N > 1 the decoder serves "
                             "tensor-parallel over the mesh.")
    parser.add_argument("--continuous", action="store_true",
                        help="gen-serve: continuous batching (llama.cpp "
                             "slot scheduler) — finished rows swap for "
                             "queued prompts mid-flight instead of "
                             "waiting on the micro-batch group barrier")
    parser.add_argument("--quantize", nargs="?", const="int8",
                        choices=["int8", "int4"], default=None,
                        help="gen-serve: serve decoder weights quantized "
                             "through the Pallas dequant kernels "
                             "(llama.cpp GGUF parity — the reference "
                             "serves Q8_0). Bare flag = int8; int4 "
                             "nibble-packs layer projections for ~1.3x "
                             "more (coarser per-channel quantization)")
    parser.add_argument("--max-len", type=int, default=None,
                        help="gen-serve: context window (prompt + "
                             "answer) in tokens. Default 2048 = the "
                             "reference checkpoint's fine-tune "
                             "max_seq_length (notebooks cell 3); the "
                             "RAG prompt template packs ~2000 chars of "
                             "retrieved context, which truncates at "
                             "shorter windows. --tiny smoke servers "
                             "default to 512")
    parser.add_argument("--quantize-kv", action="store_true",
                        help="gen-serve: int8 KV cache (llama.cpp "
                             "--cache-type-k/-v q8_0 parity) — halves "
                             "the per-step KV read and the cache HBM "
                             "footprint; composes with --quantize")
    parser.add_argument("--gguf", default=None,
                        help="gen-serve: llama.cpp GGUF file to serve "
                             "(f32/f16/bf16/q8_0/q4_0 tensors; the "
                             "embedded BPE tokenizer is rebuilt from the "
                             "file). gguf-export: output path.")
    parser.add_argument("--quant", default="q8_0",
                        choices=["q8_0", "f16", "f32"],
                        help="gguf-export: tensor storage in the written "
                             "file (q8_0 matches the reference's own "
                             "serving precision)")
    parser.add_argument("--speculative", nargs="?", const=True,
                        default=False, choices=[True, "auto"],
                        metavar="auto",
                        help="gen-serve --continuous: prompt-lookup "
                             "speculative verification per row (greedy "
                             "rows emit several token-identical tokens "
                             "per forward; sampled rows ride along). "
                             "'--speculative auto' starts speculative "
                             "and stickily demotes to the plain "
                             "scheduler if measured acceptance shows "
                             "drafting is a net loss on the workload")
    args = parser.parse_args(argv)

    from persian_rag_tpu.core.config import load_config
    from persian_rag_tpu.core.mesh import build_mesh

    config = load_config(args.config)
    mesh = None
    if args.mesh_corpus * args.mesh_data > 1:
        mesh = build_mesh(args.mesh_corpus, args.mesh_data)

    if args.command == "phase1":
        from persian_rag_tpu.pipelines import phase1

        out = phase1.main(config, mesh=mesh, tiny=args.tiny)
    elif args.command == "phase2":
        from persian_rag_tpu.pipelines import phase2

        out = phase2.main(config, mesh=mesh, tiny=args.tiny)
    elif args.command == "phase3":
        from persian_rag_tpu.pipelines import phase3

        out = phase3.main(config, mesh=mesh, tiny=args.tiny)
    elif args.command == "phase4":
        from persian_rag_tpu.pipelines import phase4

        methods = args.methods.split(",") if args.methods else None
        out = phase4.main(config, mesh=mesh, tiny=args.tiny, methods=methods)
    elif args.command == "phase4-enhanced":
        from persian_rag_tpu.pipelines import phase4_enhanced

        out = phase4_enhanced.main(config, mesh=mesh, tiny=args.tiny)
    elif args.command == "create-embeddings":
        from persian_rag_tpu.pipelines import create_embeddings

        out = create_embeddings.main(
            config, mesh=mesh, tiny=args.tiny,
            force=args.force, verify=args.verify,
        )
    elif args.command == "run-all":
        from persian_rag_tpu.pipelines import run_all

        out = run_all.main(config, mesh=mesh, tiny=args.tiny)
    elif args.command == "fast-test":
        from persian_rag_tpu.pipelines import fast_test

        fast_test.run_menu(config)
        return 0
    elif args.command == "status":
        from persian_rag_tpu.pipelines.fast_test import show_system_status

        out = show_system_status(config)
    elif args.command == "ui":
        from persian_rag_tpu.ui.app import launch

        launch(config)
        return 0
    elif args.command == "serve":
        import os

        import pandas as pd

        from persian_rag_tpu.retrieval.system import RetrievalSystem
        from persian_rag_tpu.serve.api import RetrievalServer

        chunk_csv = os.path.join(
            config.paths.processed_dir, "drugs_word_chunks.csv"
        )
        retriever = RetrievalSystem(method="bm25")
        retriever.load_chunks_and_index(
            pd.read_csv(chunk_csv, encoding="utf-8").to_dict("records")
        )
        server = RetrievalServer(retriever, port=8200 if args.port is None else args.port).start()
        print(f"retrieval API at {server.url} (POST /search, /rag)")
        try:
            server._thread.join()
        except KeyboardInterrupt:
            server.stop()
        return 0
    elif args.command == "gen-serve":
        import os

        if args.max_len is None:
            args.max_len = 512 if args.tiny else 2048

        import jax.numpy as jnp

        from persian_rag_tpu.gen.generator import TextGenerator
        from persian_rag_tpu.gen.local_server import LocalGenerationServer
        from persian_rag_tpu.models.decoder import (
            DecoderConfig,
            params_from_llama,
        )

        if args.gguf:
            generator = TextGenerator.from_gguf(
                args.gguf, max_len=args.max_len, mesh=mesh,
                quantize=args.quantize or None,
                quantize_kv=args.quantize_kv,
            )
            from persian_rag_tpu.gen.generator import ByteTokenizer

            if isinstance(generator.tokenizer, ByteTokenizer):
                # a real-weight server with the byte fallback tokenizer
                # would emit garbage while looking healthy — refuse
                print(
                    f"error: {args.gguf} embeds no tokenizer.ggml.tokens "
                    "metadata; gen-serve needs the file's tokenizer",
                    file=sys.stderr,
                )
                return 2
            server = LocalGenerationServer(
                generator, port=8080 if args.port is None else args.port,
                max_batch=args.max_batch, continuous=args.continuous,
                speculative=args.speculative,
            ).start()
            print(
                f"generation server at {server.url} "
                f"(llama.cpp-compatible /completion, /v1/chat/completions; "
                f"GGUF: {args.gguf})"
            )
            try:
                server._thread.join()
            except KeyboardInterrupt:
                server.stop()
            return 0
        params, tokenizer = None, None
        if args.checkpoint:
            from persian_rag_tpu.models.hf_loader import _read_state_dict
            from persian_rag_tpu.models.tokenizer import HFTokenizer

            tok_path = os.path.join(args.checkpoint, "tokenizer.json")
            if not os.path.exists(tok_path):
                # a real-weight server with the byte fallback tokenizer
                # would emit garbage while looking healthy — refuse
                print(
                    f"error: {tok_path} not found; gen-serve needs the "
                    "checkpoint's tokenizer.json (sentencepiece-only "
                    "checkpoints: convert with transformers' "
                    "convert_slow_tokenizer first)",
                    file=sys.stderr,
                )
                return 2
            tokenizer = HFTokenizer(tok_path)
            with open(
                os.path.join(args.checkpoint, "config.json"),
                encoding="utf-8",
            ) as f:
                hf = json.load(f)
            dec_config = DecoderConfig.from_hf(hf, compute_dtype=jnp.bfloat16)
            params = params_from_llama(
                _read_state_dict(args.checkpoint), dec_config
            )
        elif args.tiny:
            dec_config = DecoderConfig.tiny(compute_dtype=jnp.bfloat16)
        else:
            dec_config = DecoderConfig.llama32_1b(compute_dtype=jnp.bfloat16)
        generator = TextGenerator(
            dec_config, params=params, tokenizer=tokenizer,
            max_len=args.max_len, mesh=mesh, quantize=args.quantize,
            quantize_kv=args.quantize_kv,
        )
        server = LocalGenerationServer(
            generator, port=8080 if args.port is None else args.port,
            max_batch=args.max_batch, continuous=args.continuous,
            speculative=args.speculative,
        ).start()
        print(
            f"generation server at {server.url} "
            f"(llama.cpp-compatible /completion, /v1/chat/completions; "
            f"{'random weights — smoke only' if params is None else 'checkpoint loaded'})"
        )
        try:
            server._thread.join()
        except KeyboardInterrupt:
            server.stop()
        return 0
    elif args.command == "gguf-export":
        # the TPU-native replacement for the reference notebook's GGUF
        # export cell (save_pretrained_gguf, notebooks cell 7): an HF
        # LlamaForCausalLM checkpoint dir (e.g. a fine-tune saved by
        # train/lora.py's merge path) -> llama.cpp-servable GGUF.
        import os

        from persian_rag_tpu.models.decoder import (
            DecoderConfig,
            params_from_llama,
        )
        from persian_rag_tpu.models.gguf import write_decoder_gguf
        from persian_rag_tpu.models.hf_loader import _read_state_dict

        if not args.checkpoint or not args.gguf:
            print(
                "usage: gguf-export --checkpoint <hf_dir> --gguf <out.gguf>"
                " [--quant q8_0|f16|f32]",
                file=sys.stderr,
            )
            return 2
        with open(
            os.path.join(args.checkpoint, "config.json"), encoding="utf-8"
        ) as f:
            hf = json.load(f)
        dec_config = DecoderConfig.from_hf(hf)
        params = params_from_llama(
            _read_state_dict(args.checkpoint), dec_config
        )
        extra = None
        tok_json = os.path.join(args.checkpoint, "tokenizer.json")
        if os.path.exists(tok_json):
            from persian_rag_tpu.models.gguf import tokenizer_metadata_from_hf

            extra = tokenizer_metadata_from_hf(tok_json)
        else:
            print(
                "warning: no tokenizer.json in the checkpoint — the "
                "exported GGUF will not tokenize under llama.cpp",
                file=sys.stderr,
            )
        write_decoder_gguf(
            args.gguf, dec_config, params, quant=args.quant,
            name=os.path.basename(args.checkpoint.rstrip("/")) or "decoder",
            extra_metadata=extra,
        )
        size = os.path.getsize(args.gguf)
        print(f"wrote {args.gguf} ({size / 1e6:.1f} MB, {args.quant})")
        return 0
    elif args.command == "bench":
        import subprocess

        return subprocess.call([sys.executable, "bench.py"])
    else:  # pragma: no cover
        return 1
    print(json.dumps(out, ensure_ascii=False, indent=2, default=str)[:4000])
    return 0


if __name__ == "__main__":
    sys.exit(main())
