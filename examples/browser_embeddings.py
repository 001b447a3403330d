"""Browser deployment example (the kjarni-wasm story).

Export an encoder to a static bundle, then serve web/ + the bundle and use
web/kjarni.js from any page — no build toolchain, no server-side inference:

    python -m kjarni_tpu.cli.main export-browser minilm-l6-v2 -o web/dist
    python -m http.server -d web 8080
    # open http://localhost:8080/ — similarity demo runs fully in-browser

From JavaScript:

    const model = await KjarniModel.load("dist/");
    const vec = model.embed("hello world");          // normalized Float32Array
    model.similarity("doctor", "physician");          // cosine
    const index = new KjarniIndex(model);
    index.add("the doctor healed the patient");
    index.search("physician", 5);

GPT-2 works the same way (KjarniGPT.load + .generate) with byte-level BPE.
This script just runs the export end to end:
"""

import subprocess
import sys

model = sys.argv[1] if len(sys.argv) > 1 else "minilm-l6-v2"
subprocess.run([sys.executable, "-m", "kjarni_tpu.cli.main",
                "export-browser", model, "-o", "web/dist"], check=True)
print("bundle in web/dist — serve web/ statically and open index.html")
