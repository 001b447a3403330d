module github.com/kjarni/kjarni-go

go 1.21
