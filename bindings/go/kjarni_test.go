// Tests mirror kjarni-ffi/bindings/go tests: require libkjarni.so and a model
// cache; skip gracefully when the native library is unavailable.
//
//   CGO_CFLAGS="-I$REPO/native" CGO_LDFLAGS="-L$REPO/native" \
//   LD_LIBRARY_PATH=$REPO/native go test ./...
package kjarni

import (
	"os"
	"testing"
)

func requireModels(t *testing.T) {
	if os.Getenv("KJARNI_TEST_MODELS") == "" {
		t.Skip("set KJARNI_TEST_MODELS=1 with a populated model cache")
	}
}

func TestVersion(t *testing.T) {
	if Version() == "" {
		t.Fatal("empty version")
	}
}

func TestCancelToken(t *testing.T) {
	tok, err := NewCancelToken()
	if err != nil {
		t.Fatal(err)
	}
	defer tok.Free()
	if tok.Cancelled() {
		t.Fatal("fresh token already cancelled")
	}
	tok.Cancel()
	if !tok.Cancelled() {
		t.Fatal("cancel did not stick")
	}
}

func TestClassifier(t *testing.T) {
	requireModels(t)
	c, err := NewClassifier("")
	if err != nil {
		t.Fatal(err)
	}
	defer c.Close()
	res, err := c.Classify("I love this product!")
	if err != nil {
		t.Fatal(err)
	}
	if res.Label == "" || res.Score <= 0 {
		t.Fatalf("bad result %+v", res)
	}
	batch, err := c.ClassifyBatch([]string{"great", "terrible"})
	if err != nil || len(batch) != 2 {
		t.Fatalf("batch failed: %v %v", batch, err)
	}
}

func TestEmbedder(t *testing.T) {
	requireModels(t)
	e, err := NewEmbedder("")
	if err != nil {
		t.Fatal(err)
	}
	defer e.Close()
	v, err := e.Embed("hello world")
	if err != nil || len(v) == 0 {
		t.Fatalf("embed failed: %v", err)
	}
	sim, err := e.Similarity("doctor", "physician")
	if err != nil || sim <= 0 {
		t.Fatalf("similarity failed: %v %v", sim, err)
	}
	vecs, err := e.EmbedBatch([]string{"a", "b"})
	if err != nil || len(vecs) != 2 {
		t.Fatalf("batch failed: %v", err)
	}
}

func TestGeneratorStreamCancel(t *testing.T) {
	requireModels(t)
	g, err := NewGenerator("")
	if err != nil {
		t.Fatal(err)
	}
	defer g.Close()
	tok, _ := NewCancelToken()
	defer tok.Free()
	n := 0
	err = g.GenerateStream("Once upon a time", tok, func(s string) bool {
		n++
		return n < 3 // stop after 3 tokens
	})
	if err != nil {
		t.Fatal(err)
	}
	if n < 1 || n > 4 {
		t.Fatalf("unexpected token count %d", n)
	}
}
