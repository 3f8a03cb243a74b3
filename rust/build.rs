// Link against the repo-built libpanda_host.so (panda_tpu/native/Makefile).
// The reference build script compiles its CUDA static lib and emits cargo
// link directives (/root/reference/build.rs:7-59); here the native library
// already exists as a shared object, so this script only locates it.
//
// Override the directory with PANDA_NATIVE_DIR.

use std::env;
use std::path::PathBuf;

fn main() {
    println!("cargo:rerun-if-env-changed=PANDA_NATIVE_DIR");
    let dir = match env::var("PANDA_NATIVE_DIR") {
        Ok(d) => PathBuf::from(d),
        Err(_) => {
            let manifest = PathBuf::from(env::var("CARGO_MANIFEST_DIR").unwrap());
            manifest
                .parent()
                .expect("crate has a parent dir")
                .join("panda_tpu")
                .join("native")
        }
    };
    let so = dir.join("libpanda_host.so");
    if !so.exists() {
        panic!(
            "libpanda_host.so not found at {} — build it first with \
             `make -C panda_tpu/native` (or set PANDA_NATIVE_DIR)",
            so.display()
        );
    }
    println!("cargo:rustc-link-search=native={}", dir.display());
    println!("cargo:rustc-link-lib=dylib=panda_host");
    // Test binaries resolve the .so at runtime without LD_LIBRARY_PATH.
    println!("cargo:rustc-link-arg=-Wl,-rpath,{}", dir.display());
}
